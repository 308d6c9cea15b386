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
    doc="NTILE decile bucketing + per-bucket stats. The global order-by "
    "window is the scale caveat: at 100 TB use approx quantile cut "
    "points (x_approx_sketches) instead of a single-partition NTILE.",
)
def q_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select("o_totalprice", F.ntile(10).over(w).alias("decile"))
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
