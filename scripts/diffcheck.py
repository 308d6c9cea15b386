"""Differential-check a subset of registered queries against their DuckDB
oracles, mirroring the driver's vanilla-session comparison.

Usage: python scripts/diffcheck.py [query ...]   (no args = all queries)
Env:   DIFF_SF_DIR (default /root/testdata/sf0.01)
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession


def canon(v):
    if v is None:
        return "N"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return str(v)


# Width-hazard lint shared with tests/test_oracle.py; lives in the
# import-light scripts/_oracle_lint.py so the duck-only registry lint
# does not pay the pyspark import this module needs.
from scripts._oracle_lint import width_hazards  # noqa: E402


def main() -> int:
    sf = os.environ.get("DIFF_SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from blspark.catalog import TABLES, registry

    reg = registry()
    names = sys.argv[1:] or list(reg)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    fails = []
    for name in names:
        q = reg[name]
        try:
            sdf = q.spark_fn(spark, sf)
            srows = [tuple(r) for r in sdf.collect()]
            if q.oracle is None:
                print(f"{name}: rows-only {len(srows)}")
                continue
            # A width hazard is a failure, but fall through to the value
            # diff so a query with both a hazard and a genuine value
            # mismatch reports both in one run (ADVICE r6 item 3).
            hazards = width_hazards(con, q.oracle)
            if hazards:
                fails.append(name)
                print(f"{name}: WIDTH-HAZARD {hazards}")
            rel = con.execute(q.oracle)
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
            scols = sdf.columns
            so = sorted(range(len(scols)), key=lambda i: scols[i])
            do = sorted(range(len(dcols)), key=lambda i: dcols[i])
            sh = sorted("|".join(canon(r[i]) for i in so) for r in srows)
            dh = sorted("|".join(canon(r[i]) for i in do) for r in drows)
            ok = sorted(scols) == sorted(dcols) and sh == dh
            label = "OK" if ok else "MISMATCH"
            if hazards:
                label = f"values-{label.lower()} (but width-hazard)"
            print(f"{name}: {label} ({len(srows)} rows)")
            if not ok:
                if name not in fails:
                    fails.append(name)
                if sorted(scols) != sorted(dcols):
                    print(f"  cols spark={sorted(scols)} duck={sorted(dcols)}")
                else:
                    bad = [(a, b) for a, b in zip(sh, dh) if a != b][:3]
                    for a, b in bad:
                        print(f"  spark={a}\n  duck ={b}")
        except Exception as ex:
            fails.append(name)
            print(f"{name}: ERROR {str(ex)[:300]}")
    print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
