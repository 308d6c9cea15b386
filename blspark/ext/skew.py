"""Skew mitigation for hot join keys: salted equi-joins.

A shuffle join hash-partitions both sides by the join key, so one hot
key (a viral document, a mega-customer) lands every matching row on a
single reducer — the classic straggler at 100 TB. ``salted_join`` splits
each hot key across ``num_salts`` reducers: the probe (large, skewed)
side gets a deterministic per-row salt in ``[0, num_salts)``, the build
side is replicated once per salt value, and the join key becomes
``(key, salt)``. The result is row-identical to the plain equi-join;
only the shuffle placement changes. Cost: the build side shuffles
``num_salts``× its size — use it when build ≪ probe (the usual skew
case) but too big or too dynamic to broadcast.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin.enabled``)
solves the same problem at runtime by splitting oversized partitions;
this operator is the explicit, planner-independent form — it also works
under aggregation keys (salt the groupBy, then re-aggregate), where AQE
skew handling does not apply.

The salt must be DETERMINISTIC (a hash of the row, not ``rand()``) so
retried/speculative tasks produce identical output — a correctness
requirement under Spark's task-retry model, not a style choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def row_salt(df: DataFrame, num_salts: int) -> Column:
    """Deterministic per-row salt in [0, num_salts): xxhash64 over every
    column (JVM-side, no Python). Collision-free distribution is not
    needed — only spread; identical rows salting identically is fine."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts)).cast(
        "int"
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probe`` (large, possibly skewed) with ``build``
    (smaller), spreading each key over ``num_salts`` reducers.

    Returns the same rows as ``probe.join(build, probe[probe_key] ==
    build[build_key], how)`` with both key columns retained. Supported
    ``how``: inner / left (guarantees below break for right/full since
    build rows are replicated)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    p = probe.withColumn(SALT_COL, row_salt(probe, num_salts))
    b = build.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<int>"))
    )
    cond = (p[probe_key] == b[build_key]) & (p[SALT_COL] == b[SALT_COL])
    joined = p.join(b, cond, how)
    return joined.drop(p[SALT_COL]).drop(b[SALT_COL])
