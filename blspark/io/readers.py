"""Scans / sources (SURVEY.md §2.1).

- S8  padded tab-separated TSV  -> ``read_padded_tsv``
- S9  JSON-records document     -> ``read_json_records``
- parquet star-schema tables    -> ``read_parquet_tables``

All readers return lazy DataFrames; filters and projections applied by
callers push down into the scans (Catalyst `PushedFilters`/`ReadSchema`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from blspark.clean import strip_column_names

# Fixed layout of the BLS `pr.data.0.Current` observations file
# (SURVEY.md §1.4; reference notebook cell 6c34ff05). Read as strings and
# coerce afterwards — the raw file pads both headers and values.
BLS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.StringType()),
        T.StructField("year", T.StringType()),
        T.StructField("period", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("footnote_codes", T.StringType()),
    ]
)


def read_padded_tsv(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Tab-separated scan with whitespace-padded headers (reference
    report_processor.py:22-31 reads with ``pd.read_csv(sep='\\t')`` and the
    header padding survives). We strip header names on read; cell values
    keep their padding for the cleaning layer to trim, matching the
    reference order of operations."""
    reader = spark.read.option("sep", "\t").option("header", True)
    if schema is not None:
        # Explicit schema needs header names to match; read headerless
        # with names from the schema instead of relying on padded header.
        df = reader.schema(schema).csv(path)
    else:
        df = reader.option("inferSchema", False).csv(path)
    return strip_column_names(df)


def read_json_records(
    spark: SparkSession, path: str, record_field: str = "data"
) -> DataFrame:
    """JSON-records scan: one JSON document holding an array of records
    under ``record_field`` (reference report_processor.py:34-45 /
    Task2_Fetch_api_data.py payload ``{"data": [...], "source": [...]}``).
    Reads multiLine, explodes the record array, flattens the struct."""
    raw = spark.read.option("multiLine", True).json(path)
    if record_field not in raw.columns:
        return raw
    return raw.select(F.explode(F.col(record_field)).alias("_rec")).select("_rec.*")


def read_parquet_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Load the driver's star-schema parquet tables as a dict of lazy
    DataFrames (TESTDATA.md)."""
    from blspark.catalog import TABLES

    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in (tables or TABLES)}
