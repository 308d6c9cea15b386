"""Advanced relational surface — multidimensional aggregation, pivot /
unpivot, window frames, as-of + range joins, datetime/regex scalars,
conditional aggregation, word counting. The reference needs none of
these (SURVEY.md §2.4 'no grouping sets, cube, rollup'), but the
extended scope (BASELINE.json north star) and any real analytics user
does — all are Catalyst built-ins except the as-of join
(blspark.ext.asof, cogrouped merge_asof)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blspark.catalog import dsum, load_table, o_dsum, register
from blspark.ext.asof import asof_join_window

# ---------------------------------------------------------------------------
# Multidimensional aggregation: ROLLUP / CUBE / GROUPING SETS
# ---------------------------------------------------------------------------


@register(
    "q_rollup",
    oracle=f"""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           COUNT(*) AS n_rows,
           {o_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals: (flag, status), (flag), grand total. "
    "One pass, Spark expands grouping sets in the aggregate.",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), dsum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


@register(
    "q_cube",
    oracle=f"""
    SELECT COALESCE(o_orderpriority, '<all>') AS priority,
           COALESCE(CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR), '<all>') AS year,
           COUNT(*) AS n_orders,
           {o_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY CUBE(o_orderpriority, EXTRACT(year FROM o_orderdate))
    """,
    doc="CUBE over (priority, year): all 4 grouping-set combinations in "
    "one aggregate pass.",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "oyear", F.year("o_orderdate").cast("string")
    )
    return (
        orders.cube("o_orderpriority", "oyear")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total"))
        .select(
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            F.coalesce("oyear", F.lit("<all>")).alias("year"),
            "n_orders",
            "total",
        )
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot
# ---------------------------------------------------------------------------


@register(
    "q_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {o_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_o,
           {o_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot l_linestatus into columns (wide form). Spark .pivot with "
    "explicit values avoids the extra distinct-values job.",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_o"),
            F.col("F").alias("qty_f"),
        )
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value
    FROM part
    """,
    doc="Unpivot (melt) wide columns to (key, metric, value) long form "
    "via the stack() generator.",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.expr(
            "stack(2, 'size', CAST(p_size AS DOUBLE), "
            "'retailprice', p_retailprice) AS (metric, value)"
        ),
    )


# ---------------------------------------------------------------------------
# Window frames: sliding row frames, first/last value
# ---------------------------------------------------------------------------


@register(
    "q_window_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(28,4)))
                OVER (PARTITION BY user_id
                      ORDER BY CAST(ts AS TIMESTAMP), event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (PARTITION BY user_id
                              ORDER BY CAST(ts AS TIMESTAMP), event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS moving_avg3
    FROM events
    """,
    doc="3-row sliding mean per user (ROWS BETWEEN frame); decimal-sum "
    "over the frame keeps it engine-deterministic.",
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast("decimal(28,4)")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("moving_avg3"),
    )


@register(
    "q_window_first_last",
    oracle="""
    SELECT event_id, user_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER
             (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_type,
           LEAD(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
    doc="first_value / last_value (full-frame) / lead over per-user "
    "timelines.",
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(wfull).alias("last_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )


# ---------------------------------------------------------------------------
# As-of join + range join
# ---------------------------------------------------------------------------


@register(
    "q_asof_prev_order",
    oracle="""
    WITH tagged AS (
      SELECT l.o_orderkey,
             strftime(r.o_orderdate, '%Y%m%d%H%M%S') || '#' ||
               lpad(CAST(r.o_orderkey AS VARCHAR), 12, '0') AS tag
      FROM orders l
      JOIN orders r
        ON l.o_custkey = r.o_custkey AND r.o_orderdate < l.o_orderdate
    )
    SELECT o.o_orderkey, o.o_custkey, p.prev_tag
    FROM orders o
    LEFT JOIN (SELECT o_orderkey, MAX(tag) AS prev_tag
               FROM tagged GROUP BY o_orderkey) p
      ON p.o_orderkey = o.o_orderkey
    """,
    doc="As-of join: each order matched to the customer's latest STRICTLY "
    "earlier order (ties -> max orderkey). Spark side: union + "
    "last(ignoreNulls) window (blspark.ext.asof.asof_join_window) — "
    "all-JVM, one shuffle; the cogrouped pandas merge_asof variant "
    "(asof_join) has identical semantics for pandas-heavy pipelines.",
    bench=True,
)
def q_asof_prev_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    left = orders.select("o_orderkey", "o_custkey", "o_orderdate")
    right = orders.select("o_custkey", "o_orderdate", "o_orderkey")
    joined = asof_join_window(
        left,
        right,
        on="o_orderdate",
        by="o_custkey",
        right_cols=["o_orderdate", "o_orderkey"],
        allow_exact_matches=False,
        tiebreak=["o_orderkey"],
    )
    return joined.select(
        "o_orderkey",
        "o_custkey",
        F.when(
            F.col("o_orderdate_prev").isNotNull(),
            F.concat(
                F.date_format("o_orderdate_prev", "yyyyMMddHHmmss"),
                F.lit("#"),
                F.lpad(F.col("o_orderkey_prev").cast("string"), 12, "0"),
            ),
        ).alias("prev_tag"),
    )


@register(
    "q_range_join_bands",
    oracle=f"""
    WITH bands(lo, hi, band) AS (
      VALUES (0.0, 100000.0, 'low'),
             (100000.0, 300000.0, 'mid'),
             (300000.0, 1e12, 'high')
    )
    SELECT b.band, COUNT(*) AS n_orders, {o_dsum('o.o_totalprice')} AS total
    FROM orders o JOIN bands b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
    doc="Range (theta) join against a tiny band dim -> "
    "BroadcastNestedLoopJoin; at scale, bucketize the range key to an "
    "equi-join when the dim grows.",
)
def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [(0.0, 100000.0, "low"), (100000.0, 300000.0, "mid"), (300000.0, 1e12, "high")],
        "lo double, hi double, band string",
    )
    return (
        orders.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total"))
    )


# ---------------------------------------------------------------------------
# Sliding event-time windows
# ---------------------------------------------------------------------------


@register(
    "q_events_sliding_window",
    oracle=f"""
    SELECT make_timestamp(
             (epoch_us(ts) // 1800000000) * 1800000000 - offs) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {o_dsum('value')} AS total_value
    FROM events, (VALUES (CAST(0 AS BIGINT)), (CAST(1800000000 AS BIGINT))) o(offs)
    GROUP BY 1, 2
    """,
    doc="Sliding 1-hour window, 30-minute slide: every event lands in 2 "
    "overlapping windows (F.window with slideDuration).",
)
def q_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# Scalar sweeps: datetime, regex/string, null handling, conditional aggs
# ---------------------------------------------------------------------------


@register(
    "q_datetime_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
           CAST(EXTRACT(day FROM o_orderdate) AS INT) AS d,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           date_trunc('month', o_orderdate) AS month_start,
           last_day(o_orderdate) AS month_end,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT)
             AS days_to_2002
    FROM orders WHERE o_orderkey < 500
    """,
    doc="Datetime surface: extract fields, day-of-week (aligned to "
    "Spark's 1=Sunday), truncation, last_day, day difference.",
)
def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.trunc("o_orderdate", "month").alias("month_start"),  # DATE, like DuckDB's

        F.last_day("o_orderdate").alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), "o_orderdate").alias(
            "days_to_2002"
        ),
    )


@register(
    "q_regex_string_funcs",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '#(\\d+)', 1) AS cust_num,
           lpad(CAST(c_custkey AS VARCHAR), 10, '*') AS padded,
           replace(c_mktsegment, 'A', '@') AS replaced,
           reverse(c_mktsegment) AS rev,
           repeat('ab', 3) AS rep,
           CAST(contains(c_name, '42') AS BOOLEAN) AS has42
    FROM customer
    """,
    doc="Regex extraction + lpad/replace/reverse/repeat/contains scalar "
    "sweep.",
)
def q_regex_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", "#(\\d+)", 1).alias("cust_num"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "*").alias("padded"),
        F.replace(F.col("c_mktsegment"), F.lit("A"), F.lit("@")).alias("replaced"),
        F.reverse("c_mktsegment").alias("rev"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.col("c_name").contains("42").alias("has42"),
    )


@register(
    "q_null_handling",
    oracle="""
    SELECT event_id,
           COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE),
                    -1.0) AS k_or_default,
           NULLIF(event_type, 'error') AS type_no_error,
           CASE WHEN value IS NULL THEN 'missing' ELSE 'present' END AS presence
    FROM events
    """,
    doc="coalesce / nullif / null-predicate CASE — the defensive-null "
    "surface (reference guards, SURVEY §2.11).",
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(
            F.get_json_object("props", "$.k").try_cast("double"), F.lit(-1.0)
        ).alias("k_or_default"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_no_error"),
        F.when(F.col("value").isNull(), "missing").otherwise("present").alias(
            "presence"
        ),
    )


@register(
    "q_conditional_agg",
    oracle=f"""
    SELECT user_id,
           CAST(count_if(event_type = 'purchase') AS BIGINT) AS n_purchases,
           {o_dsum("CASE WHEN event_type = 'purchase' THEN value END")}
             AS purchase_value,
           COUNT(DISTINCT event_type) AS n_types,
           CAST(MIN(ts) AS TIMESTAMP) AS first_seen,
           CAST(MAX(ts) AS TIMESTAMP) AS last_seen
    FROM events GROUP BY user_id
    """,
    doc="Conditional aggregation (count_if / filtered sums) + multi "
    "distinct + min/max timestamps — per-entity profile rollup.",
    bench=True,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        dsum(F.when(F.col("event_type") == "purchase", F.col("value"))).alias(
            "purchase_value"
        ),
        F.countDistinct("event_type").alias("n_types"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
    )


@register(
    "q_wordcount_topk",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
    GROUP BY word
    ORDER BY n DESC, word ASC
    LIMIT 20
    """,
    doc="Word frequency top-20 (explode + hash agg + TakeOrdered) — the "
    "canonical distributed text pipeline shape.",
)
def q_wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@register(
    "q_union_by_name",
    oracle="""
    SELECT * FROM (
      SELECT c_custkey AS entity_id, c_name AS name, c_acctbal AS balance
      FROM customer
      UNION ALL BY NAME
      SELECT s_suppkey AS entity_id, s_name AS name, s_acctbal AS balance,
             s_nationkey AS nation
      FROM supplier
    ) t
    """,
    doc="Schema-evolving union: unionByName(allowMissingColumns=True) "
    "null-fills the narrower side.",
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("balance"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("balance"),
        F.col("s_nationkey").alias("nation"),
    )
    return cust.unionByName(supp, allowMissingColumns=True)


@register(
    "q_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum('l_quantity')} AS sum_qty,
           COUNT(*) AS n,
           CAST(GROUPING(l_returnflag) AS INT) * 2
             + CAST(GROUPING(l_linestatus) AS INT) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus))
    """,
    doc="GROUPING SETS (the general form behind ROLLUP/CUBE): three "
    "explicit grouping combinations in ONE pass over the fact table "
    "with a grouping-id disambiguator — vs three scans + union. Same "
    "partial-aggregation shuffle as a plain groupBy.",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("v_lineitem_gs")
    return spark.sql(f"""
      SELECT l_returnflag, l_linestatus,
             {{}} AS sum_qty,
             COUNT(*) AS n,
             CAST(GROUPING(l_returnflag) AS INT) * 2
               + CAST(GROUPING(l_linestatus) AS INT) AS gid
      FROM v_lineitem_gs
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                              (l_returnflag), (l_linestatus))
    """.format("CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS STRING) AS DOUBLE)"))
