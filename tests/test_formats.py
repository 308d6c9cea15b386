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


def test_schema_evolution_mergeschema(spark, tmp_path):
    """Parquet schema evolution: files written with and without a new
    column union under mergeSchema; old files read nulls for it."""
    p = str(tmp_path / "evo")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(
        p + "/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.parquet(p + "/batch=2")
    df = spark.read.option("mergeSchema", True).parquet(p)
    assert set(df.columns) >= {"id", "v", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_csv_malformed_rows_permissive_and_dropmalformed(spark, tmp_path):
    """Bad-records handling on CSV scans: PERMISSIVE nulls out bad
    fields and captures the raw line; DROPMALFORMED removes the row —
    the reference's None-on-failure contract at scan level."""
    f = tmp_path / "m.csv"
    f.write_text("id,v\n1,10\nbad_row_without_delim\n3,30\n")
    schema = "id int, v int, _corrupt_record string"
    perm = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(f))
    )
    rows = perm.collect()
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(rows) == 3 and len(corrupt) == 1
    dropped = (
        spark.read.schema("id int, v int")
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(str(f))
    )
    assert sorted(r.id for r in dropped.collect()) == [1, 3]


def test_dynamic_partition_pruning_on_join(spark, tmp_path):
    """DPP: a partitioned fact joined on its partition column with a
    FILTERED dim must get a runtime `dynamicpruningexpression` on the
    scan — the join's build side prunes fact partitions before they are
    read. At 100 TB this is the difference between scanning one
    partition and scanning the table when the filter lives on the dim,
    not the fact."""
    from tests.conftest import SF_SMOKE

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    p = str(tmp_path / "orders_by_year")
    orders.write.mode("overwrite").partitionBy("o_year").parquet(p)
    fact = spark.read.parquet(p)
    years = (
        orders.select("o_year")
        .distinct()
        .withColumn("pick", F.col("o_year") % 7)
    )
    dim = years.filter(F.col("pick") == 3).select("o_year")
    joined = fact.join(dim, "o_year")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:3000]
    want = {r["o_year"] for r in dim.collect()}
    got = {r["o_year"] for r in joined.select("o_year").distinct().collect()}
    assert got == want and got  # pruned result is exactly the picked years


def test_write_layout_parquet_sorted_bounded_files(spark, tmp_path):
    """Layout sink contract: maxRecordsPerFile bounds every data file,
    files are internally sorted on the sort key (what makes parquet
    row-group min/max stats selective), and partition dirs exist."""
    import glob as _glob

    from blspark.io.sinks import write_layout_parquet
    from tests.conftest import SF_SMOKE

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_returnflag", "l_extendedprice"
    )
    p = str(tmp_path / "layout")
    write_layout_parquet(
        li,
        p,
        partition_by=("l_returnflag",),
        sort_by=("l_shipdate",),
        max_records_per_file=500,
    )
    files = _glob.glob(f"{p}/l_returnflag=*/**/*.parquet", recursive=True)
    assert len(files) > 1  # size bound split the output
    total = 0
    for f in files:
        part = spark.read.parquet(f)
        n = part.count()
        total += n
        assert n <= 500  # per-file record cap holds
        dates = [r["l_shipdate"] for r in part.select("l_shipdate").collect()]
        assert dates == sorted(dates)  # file-internal clustering
    assert total == li.count()  # nothing lost or duplicated


def test_xml_whitespace_and_empty_text(spark, tmp_path):
    """XML round-trip edge contract (ADVICE r4): with
    ignoreSurroundingSpaces=false (what x_xml_roundtrip sets) leading/
    trailing whitespace in text survives byte-exact, and empty-string
    text reads back as '' (only with the default trimming would it
    collapse to null). Pinned here so the behavior is a documented
    contract, not a silent surprise."""
    rows = [
        (1, "  padded  "),
        (2, "\tleading tab"),
        (3, "trailing space "),
        (4, ""),
        (5, "plain"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    p = str(tmp_path / "xmlws")
    df.write.format("xml").option("rowTag", "doc").mode("overwrite").save(p)
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false")
        .load(p)
    )
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got[1] == "  padded  "
    assert got[2] == "\tleading tab"
    assert got[3] == "trailing space "
    assert got[4] == ""  # empty survives (null only under default trim)
    assert got[5] == "plain"
