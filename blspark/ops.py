"""Scale utilities: skew-aware aggregation/join helpers.

AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default in
blspark.session) handles most runtime skew; these helpers cover the
cases AQE can't — a single hot GROUP BY key, or a broadcast-ineligible
join against a skewed build side — using the classic two-phase salting
pattern, expressed purely in DataFrame ops."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_sum(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    out: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase SUM for skewed group keys: phase 1 aggregates on
    (keys, salt) — spreading a hot key over ``salt_buckets`` reducers —
    phase 2 merges the partials per key. Decimal-exact, so the result is
    identical to the unsalted aggregation regardless of bucketing."""
    v = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(v.cast("decimal(28,4)")).alias("__part")
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("__part").cast("double").alias(out))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skewed equi-join: salt the fact side's key, replicate the dim side
    across all salt values, join on (key, salt). Use when the dim side is
    too big to broadcast and the fact side has hot keys; cost is
    ``salt_buckets``× duplication of the dim rows."""
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    exploded_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_fact.join(exploded_dim, on=[key, "__salt"]).drop("__salt")


def repartition_for(
    df: DataFrame, keys: list[str], target_partition_mb: int = 128,
    approx_row_bytes: int = 100, approx_rows: int | None = None,
) -> DataFrame:
    """Hash-repartition sized so each partition lands near the target
    size — the knob that keeps shuffle partitions spill-free at any SF.
    With AQE coalescing enabled the estimate only needs to be an upper
    bound."""
    rows = approx_rows if approx_rows is not None else df.count()
    bytes_total = rows * approx_row_bytes
    n = max(1, bytes_total // (target_partition_mb * 1024 * 1024))
    return df.repartition(int(n), *keys)


def checked_pipeline(*stages: Callable[[DataFrame], DataFrame]):
    """Compose DataFrame -> DataFrame stages (the reference's
    load->clean->query chains as first-class pipelines)."""

    def run(df: DataFrame) -> DataFrame:
        for stage in stages:
            df = stage(df)
        return df

    return run


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Raise scan parallelism for CPU-heavy narrow pipelines (per-row
    MD5/shingling/vector math). Parquet scans split at row-group
    boundaries, so a small local file yields ~1 effective partition and a
    compute-bound stage serializes on one core — while at cluster scale
    the same query naturally gets thousands of splits. No-op when the
    scan would already split wide enough (gated on driver-side file
    metadata — never a job); otherwise one cheap round-robin shuffle of
    the (small) input buys full-width execution of everything
    downstream. Results are unaffected: every consumer in this repo is
    partition-order independent by construction. Apply directly to the
    scan frame: the gate reads scan-level file metadata, so a frame that
    already went through a shuffle would be re-shuffled."""
    import os

    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
        if not files:  # non-file source (range, shuffle output): leave as-is
            return df
        max_split = int(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728").rstrip("b"))
        total = 0
        for f in files:
            p = f[len("file:"):] if f.startswith("file:") else f
            total += os.path.getsize(p) if os.path.exists(p) else max_split
        est_splits = max(len(files), (total + max_split - 1) // max_split)
    except Exception:
        return df  # unknown source: assume wide enough, no-op
    if est_splits < target:
        return df.repartition(target)
    return df


def local_relation(df: DataFrame, schema: str, max_rows: int = 65536) -> DataFrame:
    """Materialize a METADATA-SIZED frame as a local relation: collect,
    sort for a deterministic row order, rebuild with an explicit
    schema. Severs lineage so every downstream branch reuses the rows
    instead of re-executing the producing subtree — with NO
    cache-manager entry (a persist() inside a lazy plan builder would
    leak past the function's lifetime; extensions3 convention). Only
    for frames bounded by construction (codebooks, centroids, seed
    lists) — never for data-sized frames.

    The rebuild goes through pandas/Arrow ON PURPOSE: a plain
    ``createDataFrame(rows, schema)`` produces a PYTHON-RDD-backed
    plan (``Scan ExistingRDD``) that re-enters a Python worker on
    EVERY downstream action — measured ~1-2 s per reference for a
    10-row centroid frame, and pathological (12 s) when two such
    frames cross-join. The Arrow path produces a true JVM
    ``LocalTableScan``: no Python workers, instantly broadcastable,
    visible to Catalyst as a local relation. Arrow float64 transfer
    is exact for FINITE values, so the numeric policy is unaffected —
    but pandas cannot distinguish NULL from NaN in a top-level float
    column (NaN would arrive as NULL under Arrow, and NULL as NaN
    without it), so any frame carrying NaN/NULL in a top-level
    float/double field routes to the RDD path instead (slower,
    semantics-preserving); likewise any type Arrow cannot convert.

    ``max_rows`` is a hard guard against misuse on corpus-sized
    frames: the collect is capped at ``max_rows + 1`` rows and a
    ``ValueError`` is raised if the input exceeds the bound, so an
    oversized caller fails fast instead of pulling a corpus onto the
    driver. The default (65536) is ~3 orders of magnitude above the
    largest current caller (centroids k<=32, codebooks 16x256,
    probed-cell maps) while still far below corpus scale."""
    import math

    from pyspark.sql.types import DoubleType, FloatType, _parse_datatype_string

    rows = sorted(tuple(r) for r in df.limit(max_rows + 1).collect())
    if len(rows) > max_rows:
        raise ValueError(
            f"local_relation: input exceeds max_rows={max_rows}; this "
            "helper is for metadata-sized frames (centroids, codebooks, "
            "thresholds) — a corpus-sized frame must stay distributed"
        )
    spark = df.sparkSession
    st = _parse_datatype_string(schema)
    float_idx = [
        i
        for i, f in enumerate(st.fields)
        if isinstance(f.dataType, (DoubleType, FloatType))
    ]
    nan_hazard = any(
        r[i] is None or (isinstance(r[i], float) and math.isnan(r[i]))
        for r in rows
        for i in float_idx
    )
    if not nan_hazard:
        try:
            import pandas as pd

            return spark.createDataFrame(
                pd.DataFrame(rows, columns=st.fieldNames()), schema
            )
        except Exception as exc:
            # The RDD fallback silently forfeits the LocalTableScan
            # performance contract (~5x on downstream actions) — make
            # the regression detectable instead of invisible.
            import logging

            logging.getLogger(__name__).warning(
                "local_relation: Arrow/pandas path failed (%s: %s); "
                "falling back to the slow Python-RDD plan for schema %r",
                type(exc).__name__, exc, schema,
            )
    return spark.createDataFrame(rows, schema)
