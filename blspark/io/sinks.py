"""Sinks (SURVEY.md §2.1 S4, S5, S7, S11).

The reference PUTs raw bytes / timestamped JSON documents to S3 and
returns report records from the Lambda (sync_and_fetch.py:118-132,
217-246; report_processor.py:186-188, 258-267). Spark-first, sinks are
``DataFrameWriter`` calls: partitioned parquet for analytics outputs,
JSON for event-style payloads, timestamped paths for the reference's
``population_data_%Y%m%d_%H%M%S.json`` naming. Writes are idempotent by
mode; at 100 TB the partitionBy columns (e.g. a date) drive partition
pruning for every downstream read."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame


def timestamped_name(prefix: str, suffix: str = ".json", now: datetime | None = None) -> str:
    """`prefix_YYYYMMDD_HHMMSS{suffix}` — sorts lexicographically by
    time, which is what makes newest-file selection a plain max()
    (reference Task2_Fetch_api_data.py:40, report_processor.py:66-67)."""
    stamp = (now or datetime.now(timezone.utc)).strftime("%Y%m%d_%H%M%S")
    return f"{prefix}_{stamp}{suffix}"


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (S7/S11 analog)."""
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet sink — the durable analytics output. At scale,
    ``partition_by`` low-cardinality columns (date, region) so readers
    prune; never partition by a high-cardinality key (small-file
    explosion)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_layout_parquet(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    sort_by: tuple[str, ...] = (),
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Scan-optimized parquet layout — the three levers that matter when
    the OUTPUT of a pipeline stage is the INPUT of the next 100 TB scan:

    - ``partition_by``: directory-level pruning for low-cardinality keys
    - ``sort_by``: clustering within each output task/file, so parquet
      row-group min/max stats become selective and point/range filters
      skip row groups (a random layout makes every min/max span the
      whole domain — stats exist but prune nothing)
    - ``max_records_per_file``: bounds file size from above; with the
      repartition below sizing tasks, it also bounds the small-file
      explosion from below (both tails hurt: huge files serialize one
      task, tiny files melt the listing/footer path)

    Rows are first repartitioned on the partition columns so each
    (partition value) is written by few tasks (not |tasks| x |values|
    files), then sorted within tasks on partition + sort keys."""
    out = df
    if partition_by:
        from pyspark.sql import functions as F

        out = out.repartition(*[F.col(c) for c in partition_by])
    if partition_by or sort_by:
        out = out.sortWithinPartitions(*(list(partition_by) + list(sort_by)))
    w = out.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def format_numbers(df: DataFrame, columns: list[str], decimals: int = 2) -> DataFrame:
    """Display formatting `f"{x:,.2f}"` parity (reference
    report_processor.py:128-129,259) via F.format_number — presentation
    only, never feed formatted strings back into computation."""
    from pyspark.sql import functions as F

    out = df
    for c in columns:
        out = out.withColumn(c, F.format_number(F.col(c), decimals))
    return out


def report_records(df: DataFrame, limit: int | None = None) -> list[dict]:
    """The reference's `df.to_dict('records')` Lambda response shape
    (report_processor.py:186-188). Driver-side by definition — cap with
    ``limit`` so a 100 TB result can't flood the driver."""
    rows = (df.limit(limit) if limit else df).collect()
    return [row.asDict(recursive=True) for row in rows]
