"""Differential test mirroring the driver's correctness gate: every
registered query runs on Spark AND its DuckDB oracle twin over the same
parquet tables; row count, column names, and an order-insensitive
value-hash must match."""

from __future__ import annotations

import math

import pytest

from blspark.catalog import registry
from tests.conftest import SF_ORACLE

QUERIES = registry()
ORACLE_NAMES = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY_NAMES = sorted(n for n, q in QUERIES.items() if not q.oracle)


def _canon(value):
    if value is None:
        return "∅"
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{value:.10g}"
    return str(value)


def _row_multiset(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_matches_oracle(name, spark, duck):
    q = QUERIES[name]
    sdf = q.spark_fn(spark, SF_ORACLE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.execute(q.oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_hash = _row_multiset(spark_rows, spark_cols)
    d_hash = _row_multiset(duck_rows, duck_cols)
    if s_hash != d_hash:
        diff = [
            (a, b) for a, b in zip(s_hash, d_hash) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_no_width_hazard(name, duck):
    """No oracle result column may be HUGEINT/UHUGEINT/DECIMAL.

    The driver materializes oracle results via fetchdf()/Arrow, under
    which DuckDB HUGEINT (the result type of SUM over INTEGER/BIGINT)
    becomes float64 (``3`` -> ``3.0``) or decimal128, so the value-hash
    diverges from Spark's BIGINT even when every number is identical
    (the r5 hash-fail class). Cursor-level fetchall() is width-blind,
    so this lint checks the declared DuckDB type via DESCRIBE instead
    of looking at values. Fix pattern: CAST(SUM(...) AS BIGINT) on the
    aggregate's OUTPUT (an inner cast does not help — SUM re-widens).
    Catches hazards nested inside STRUCT/MAP/LIST composites too.
    """
    from scripts._oracle_lint import width_hazards

    bad = width_hazards(duck, QUERIES[name].oracle)
    assert not bad, (
        f"{name}: oracle columns {bad} would materialize width-unstably "
        f"through the driver's fetchdf()/Arrow path; wrap the aggregate "
        f"output in CAST(... AS BIGINT) (or route decimals through "
        f"o_d2d)"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(name, spark):
    q = QUERIES[name]
    df = q.spark_fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.columns) > 0
