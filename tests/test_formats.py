"""Source/format coverage: CSV / JSON / ORC round trips preserve values
and schemas (parquet is exercised everywhere else)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _sample(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
        .orderBy("c_custkey")
        .limit(50)
    )


def _values(df):
    return [
        (r["c_custkey"], r["c_name"], r["c_nationkey"], r["c_acctbal"])
        for r in df.orderBy("c_custkey").collect()
    ]


def test_csv_roundtrip(spark, tmp_path):
    df = _sample(spark)
    df.write.mode("overwrite").option("header", True).csv(str(tmp_path / "c"))
    back = (
        spark.read.option("header", True)
        .schema(df.schema)
        .csv(str(tmp_path / "c"))
    )
    assert _values(back) == _values(df)


def test_json_roundtrip(spark, tmp_path):
    df = _sample(spark)
    df.write.mode("overwrite").json(str(tmp_path / "j"))
    back = spark.read.schema(df.schema).json(str(tmp_path / "j"))
    assert _values(back) == _values(df)


def test_orc_roundtrip(spark, tmp_path):
    df = _sample(spark)
    df.write.mode("overwrite").orc(str(tmp_path / "o"))
    back = spark.read.orc(str(tmp_path / "o"))
    assert back.schema == df.schema
    assert _values(back) == _values(df)


def test_partitioned_write_prunes(spark, tmp_path):
    df = _sample(spark).withColumn("seg", F.col("c_mktsegment"))
    df.write.mode("overwrite").partitionBy("seg").parquet(str(tmp_path / "p"))
    back = spark.read.parquet(str(tmp_path / "p")).filter(F.col("seg") == "BUILDING")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(seg" in plan  # pruning reached the scan
    assert back.count() == df.filter(F.col("c_mktsegment") == "BUILDING").count()


def test_zstd_parquet_roundtrip(spark, tmp_path):
    """zstd-compressed parquet writes: the compression codec to default
    to for large-scale archival tables (better ratio than snappy at
    similar scan speed)."""
    df = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").limit(500)
    out = str(tmp_path / "orders_zstd")
    df.write.option("compression", "zstd").parquet(out)
    import glob
    import pyarrow.parquet as pq

    files = glob.glob(out + "/*.parquet")
    assert files
    meta = pq.ParquetFile(files[0]).metadata
    assert meta.row_group(0).column(0).compression.lower() == "zstd"
    back = spark.read.parquet(out)
    assert back.count() == 500
    assert sorted(back.columns) == sorted(df.columns)
