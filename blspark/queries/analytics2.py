"""Second analytics batch: rolling distinct actives, decile bucketing,
edit-distance similarity, and dedup-apply (surviving rows)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blspark.catalog import load_table, register


@register(
    "q_rolling_active_users",
    oracle="""
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), expanded AS (
      SELECT user_id, day + CAST(i AS INT) AS asof_day
      FROM user_days, UNNEST(range(7)) u(i)
    ), actual_days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS asof_day FROM events
    )
    SELECT e.asof_day, COUNT(DISTINCT e.user_id) AS wau
    FROM expanded e
    JOIN actual_days d ON d.asof_day = e.asof_day
    GROUP BY e.asof_day
    """,
    doc="7-day rolling distinct active users (WAU per day): distinct "
    "(user, day) pairs exploded over the 7 days they keep a user "
    "active, then countDistinct per day — the scalable alternative to "
    "distinct-over-window, which SQL engines don't support.",
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    expanded = user_days.select(
        "user_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(6)),
                lambda i: F.date_add(F.col("day"), i.cast("int")),
            )
        ).alias("asof_day"),
    )
    actual = ev.select(F.col("ts").cast("date").alias("asof_day")).distinct()
    return (
        expanded.join(actual, "asof_day")
        .groupBy("asof_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )


@register(
    "q_ntile_deciles",
    oracle="""
    SELECT decile,
           COUNT(*) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM (
      SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    ) t
    GROUP BY decile
    """,
    doc="NTILE decile bucketing + per-bucket stats, computed WITHOUT a "
    "single-partition global window: rows are range-partitioned on the "
    "sort key, ranked locally per partition, and local ranks are shifted "
    "by broadcast per-partition cumulative offsets — an exact distributed "
    "global row_number. Deciles then follow from NTILE's bucket formula "
    "(first n%10 buckets get one extra row), reproducing NTILE(10) "
    "bit-for-bit while every stage stays parallel.",
)
def q_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    # Range-partition on the sort key so partition id order == sort order;
    # both downstream branches reference the same exchange (ReusedExchange).
    parted = orders.repartitionByRange(
        32, "o_totalprice", "o_orderkey"
    ).withColumn("pid", F.spark_partition_id())
    wloc = Window.partitionBy("pid").orderBy("o_totalprice", "o_orderkey")
    local = parted.withColumn("local_rn", F.row_number().over(wloc))
    # Tiny per-partition counts -> cumulative start offset per pid (runs on
    # a num-partitions-sized frame, then broadcast back to the fact side).
    counts = local.groupBy("pid").agg(
        F.max("local_rn").alias("cnt")
    )
    woff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid",
        F.coalesce(F.sum("cnt").over(woff), F.lit(0)).alias("offset"),
    )
    total = counts.agg(F.sum("cnt").cast("bigint").alias("n_total"))
    ranked = (
        local.join(F.broadcast(offsets), "pid")
        .join(F.broadcast(total))
        .withColumn("rn", F.col("local_rn") + F.col("offset"))
    )
    # NTILE(k) bucket for global rank i over n rows: with q = n div k,
    # r = n mod k, the first r buckets hold q+1 rows.
    q = F.expr("n_total div 10")
    r = F.col("n_total") % 10
    big = r * (q + 1)
    decile = (
        F.when(F.col("rn") <= big, F.ceil(F.col("rn") / (q + 1)))
        .otherwise(r + F.ceil((F.col("rn") - big) / q))
        .cast("int")
        .alias("decile")
    )
    return (
        ranked.select("o_totalprice", decile)
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "q_edit_distance",
    oracle="""
    SELECT p_partkey, p_name,
           levenshtein(p_name, 'red widget') AS dist
    FROM part
    WHERE levenshtein(p_name, 'red widget') <= 4
    """,
    doc="Levenshtein edit distance filter — fuzzy string matching for "
    "entity resolution; JVM-side, codegen'd.",
)
def q_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    dist = F.levenshtein(F.col("p_name"), F.lit("red widget"))
    return part.select("p_partkey", "p_name", dist.alias("dist")).filter(
        F.col("dist") <= 4
    )


@register(
    "x_dedup_apply",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, n_chars, lang,
             ROW_NUMBER() OVER (
               PARTITION BY md5(trim(regexp_replace(
                 regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                 ' +', ' ', 'g')))
               ORDER BY doc_id ASC) AS rn
      FROM documents
    )
    SELECT doc_id, n_chars, lang FROM ranked WHERE rn = 1
    """,
    doc="Dedup APPLIED: the surviving rows (first doc_id per normalized "
    "fingerprint) — keys-only dedup (x_dedup_exact) composed with a "
    "ranking window to materialize the kept corpus.",
)
def x_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    fp = fingerprint(docs, "doc_id", "text").withColumnRenamed("id", "doc_id")
    w = Window.partitionBy("fp").orderBy(F.asc("doc_id"))
    return (
        docs.join(fp, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_chars", "lang")
    )
