"""Product-analytics query shapes over the events/orders tables —
funnel conversion, retention cohorts, exact percentiles, scalar
subqueries, histogram binning — plus SQL-API variants proving the same
engine drives `spark.sql` over registered views (SURVEY.md §7.0)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blspark.catalog import load_table, o_davg, register, register_views


@register(
    "q_percentiles_exact",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.50) AS p50,
           quantile_cont(o_totalprice, 0.95) AS p95,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Exact interpolated percentiles per group (Spark `percentile` ≡ "
    "DuckDB quantile_cont, verified bitwise). At 100 TB prefer "
    "percentile_approx (x_approx_sketches) — this is the exactness "
    "reference.",
)
def q_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
        F.expr("percentile(o_totalprice, 0.50)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@register(
    "q_funnel_conversion",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup'
                      THEN CAST(ts AS TIMESTAMP) END) AS first_signup,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(count_if(first_signup IS NOT NULL) AS BIGINT) AS n_signed_up,
           CAST(count_if(first_signup IS NOT NULL AND first_purchase IS NOT NULL
                    AND first_purchase > first_signup) AS BIGINT) AS n_converted
    FROM firsts
    """,
    doc="Funnel: users -> signed up -> purchased after signup. One "
    "grouped pass for per-user firsts, one tiny global rollup.",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.count_if(F.col("first_signup").isNotNull()).alias("n_signed_up"),
        F.count_if(
            F.col("first_signup").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") > F.col("first_signup"))
        ).alias("n_converted"),
    )


@register(
    "q_retention_cohorts",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events
    )
    SELECT c.cohort_day,
           COUNT(DISTINCT c.user_id) AS cohort_size,
           COUNT(DISTINCT CASE WHEN a.active_day = c.cohort_day + 1
                               THEN c.user_id END) AS retained_d1,
           COUNT(DISTINCT CASE WHEN a.active_day = c.cohort_day + 7
                               THEN c.user_id END) AS retained_d7
    FROM cohorts c
    JOIN activity a ON a.user_id = c.user_id
    GROUP BY c.cohort_day
    """,
    doc="Retention cohorts: first-seen day -> D1/D7 retained users. Two "
    "grouped passes + a per-user join keyed on user_id.",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    activity = ev.select(
        "user_id", F.col("ts").cast("date").alias("active_day")
    ).distinct()
    joined = cohorts.join(activity, "user_id")
    return joined.groupBy("cohort_day").agg(
        F.countDistinct("user_id").alias("cohort_size"),
        F.countDistinct(
            F.when(
                F.col("active_day") == F.date_add(F.col("cohort_day"), 1),
                F.col("user_id"),
            )
        ).alias("retained_d1"),
        F.countDistinct(
            F.when(
                F.col("active_day") == F.date_add(F.col("cohort_day"), 7),
                F.col("user_id"),
            )
        ).alias("retained_d7"),
    )


@register(
    "q_scalar_subquery",
    oracle=f"""
    WITH cust_avg AS (
      SELECT o_custkey, {o_davg('o_totalprice')} AS avg_price
      FROM orders GROUP BY o_custkey
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, a.avg_price
    FROM orders o JOIN cust_avg a ON a.o_custkey = o.o_custkey
    WHERE o.o_totalprice > 1.5 * a.avg_price
    """,
    doc="Correlated-aggregate filter (orders 1.5x above their customer's "
    "mean) — decorrelated into a grouped agg + self-join, the shape "
    "Catalyst produces for correlated scalar subqueries.",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.catalog import davg

    orders = load_table(spark, sf_dir, "orders")
    cust_avg = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        davg("o_totalprice").alias("avg_price")
    )
    return (
        orders.join(cust_avg, orders.o_custkey == F.col("k"))
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "avg_price")
    )


@register(
    "q_histogram_bins",
    oracle=f"""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bin,
           COUNT(*) AS n,
           {o_davg('o_totalprice')} AS bin_mean
    FROM orders GROUP BY 1
    """,
    doc="Fixed-width histogram binning via floor arithmetic — the "
    "portable width_bucket; one hash agg on ~20 bins.",
)
def q_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.catalog import davg

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "bin", F.floor(F.col("o_totalprice") / 50000).cast("bigint")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"), davg("o_totalprice").alias("bin_mean"))
    )


# --- SQL-API variants: same engine, spark.sql over registered views ------

SQL_BEST_YEAR = """
WITH yearly AS (
  SELECT l_suppkey AS series_key,
         CAST(EXTRACT(year FROM l_shipdate) AS INT) AS year,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS total_value
  FROM lineitem
  WHERE l_suppkey IS NOT NULL AND l_shipdate IS NOT NULL
    AND l_extendedprice IS NOT NULL
  GROUP BY l_suppkey, EXTRACT(year FROM l_shipdate)
)
SELECT series_key, year, total_value FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY series_key ORDER BY total_value DESC, year ASC) AS rn
  FROM yearly
) t WHERE rn = 1
ORDER BY series_key
"""


@register(
    "q_sql_best_year",
    oracle=SQL_BEST_YEAR,
    doc="Flagship Q2 expressed through the SQL API (spark.sql over "
    "registered temp views) — identical text runs on both engines; "
    "Catalyst produces the same plan as the DataFrame variant.",
)
def q_sql_best_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, tables=("lineitem",))
    return spark.sql(SQL_BEST_YEAR)
