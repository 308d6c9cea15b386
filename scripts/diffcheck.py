"""Differential-check a subset of registered queries against their DuckDB
oracles, mirroring the driver's vanilla-session comparison.

Usage: python scripts/diffcheck.py [query ...]   (no args = all queries)
Env:   DIFF_SF_DIR (default /root/testdata/sf0.01)
"""

import math
import os
import re
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


# DuckDB result types that materialize differently through the driver's
# fetchdf()/Arrow path than through cursor fetchall(): HUGEINT (int128,
# from SUM over INTEGER/BIGINT) becomes float64/decimal128 so the driver
# value-hash diverges even when every number matches Spark's BIGINT.
# Python-level str() canonicalization is width-blind, which is exactly
# why this script could not see the r5 failure class — hence this
# explicit type lint on every oracle (VERDICT r5 item 2).
_WIDTH_HAZARD = re.compile(r"^(HUGEINT|UHUGEINT|DECIMAL)")


def width_hazards(con, oracle_sql: str) -> list[tuple[str, str]]:
    """Columns of the oracle result whose DuckDB type would materialize
    width-unstably through the driver's fetchdf()/Arrow path."""
    rows = con.execute(f"DESCRIBE {oracle_sql}").fetchall()
    return [(r[0], r[1]) for r in rows if _WIDTH_HAZARD.match(r[1])]


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
            hazards = width_hazards(con, q.oracle)
            if hazards:
                fails.append(name)
                print(f"{name}: WIDTH-HAZARD {hazards}")
                continue
            rel = con.execute(q.oracle)
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
            scols = sdf.columns
            so = sorted(range(len(scols)), key=lambda i: scols[i])
            do = sorted(range(len(dcols)), key=lambda i: dcols[i])
            sh = sorted("|".join(canon(r[i]) for i in so) for r in srows)
            dh = sorted("|".join(canon(r[i]) for i in do) for r in drows)
            ok = sorted(scols) == sorted(dcols) and sh == dh
            print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(srows)} rows)")
            if not ok:
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
