"""Multi-join analytical queries (TPC-H Q3/Q5/Q10 shapes) over the full
star schema — exercising join ordering, dimension broadcasts, and
multi-stage aggregation. These go beyond the reference's single join
(SURVEY.md §2.3) to prove the engine handles the join topologies a real
warehouse workload needs."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blspark.catalog import davg, dsum, load_table, o_davg, o_dsum, register


@register(
    "q_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-03-15'
      AND l.l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join (customer filter broadcast into "
    "orders, fact join on orderkey) + grouped revenue + top-10.",
    bench=True,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1996-03-15").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    # Broadcast only the filtered customer dim. The orderkey join is
    # fact⋈fact at scale (date-filtered orders is still huge at 100x), so
    # pin it to shuffle-merge: without the hint Catalyst's static stats
    # broadcast the 300k-row filtered lineitem at bench SF — the exact
    # fact-side broadcast that OOMs at scale, and measurably slower than
    # SMJ even locally (1.30s -> 0.94s median at sf0.1).
    return (
        li.hint("shuffle_merge")
        .join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q_regional_revenue",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_lineitems
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    GROUP BY r.r_name, n.n_name
    ORDER BY region, nation
    """,
    doc="TPC-H Q5 shape: snowflake join region->nation->supplier->fact; "
    "every dim broadcast, fact never shuffles before aggregation.",
    bench=True,
)
def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    ).select("s_suppkey", "n_name", "r_name")
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("region", "nation")
    )


@register(
    "q_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           c.c_acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1995-10-01'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, quarter "
    "window, 4-way join + top-20.",
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        # no hint on the fact⋈fact orderkey join: the date-filtered orders
        # slice is still fact-sized at 100x — Catalyst broadcasts it at
        # bench SF from stats (identical local plan) but falls back to
        # SMJ at scale, which a hard hint would forbid
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q_nation_pairs_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS ship_year,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE sn.n_name < cn.n_name
    GROUP BY sn.n_name, cn.n_name, EXTRACT(year FROM l.l_shipdate)
    """,
    doc="TPC-H Q7 shape: supplier-nation x customer-nation shipping "
    "volumes — the same dim (nation) joined twice under different "
    "roles; all dims broadcast, one fact shuffle for the group-by.",
)
def q_nation_pairs_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        # unfiltered orders is pure fact — never hint it broadcast (see
        # q_returned_items note); stats/AQE pick broadcast at bench SF
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            )
        )
    )


@register(
    "q_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(28,4))) > 150
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
           {o_dsum('l.l_quantity')} AS total_qty
    FROM orders o
    JOIN big b ON b.l_orderkey = o.o_orderkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_custkey, o.o_totalprice
    """,
    doc="TPC-H Q18 shape: orders whose total lineitem quantity exceeds a "
    "threshold (grouped HAVING as a semi-join filter, then re-join for "
    "detail).",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # fresh alias: `big` derives from `li`, and re-joining li would make
    # l_orderkey ambiguous (self-join lineage)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,4)")).alias("q"))
        .filter(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        orders.join(big, orders.o_orderkey == F.col("big_key"))
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
    )


@register(
    "q_bls_pipeline_parity",
    oracle="""
    WITH bls AS (
      SELECT 'PRS' || lpad(CAST(l_suppkey AS VARCHAR), 8, '0') || '  ' AS series_id,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS year,
             'Q0' || CAST(EXTRACT(quarter FROM l_shipdate) AS VARCHAR) AS period,
             l_quantity AS value
      FROM lineitem
    ), clean AS (
      SELECT trim(series_id) AS series_id, year, trim(period) AS period,
             CAST(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS value
      FROM bls
      WHERE series_id IS NOT NULL AND year IS NOT NULL
        AND period IS NOT NULL AND value IS NOT NULL
      GROUP BY trim(series_id), year, trim(period)
    ), yearly AS (
      SELECT series_id, year,
             CAST(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS STRING) AS DOUBLE) AS value
      FROM clean GROUP BY series_id, year
    )
    SELECT series_id, year, value FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY series_id ORDER BY value DESC, year ASC) AS rn
      FROM yearly
    ) t WHERE rn = 1
    ORDER BY series_id
    """,
    doc="End-to-end reference pipeline on BLS-shaped data derived from "
    "lineitem (padded series ids, quarter periods): clean (trim) -> "
    "per-period sums -> best_years (Q2 semantics) through the actual "
    "blspark.queries.bls + blspark.clean code paths. Ref "
    "report_processor.py:135-188.",
)
def q_bls_pipeline_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.clean import trim_string_columns
    from blspark.queries.bls import best_years

    li = load_table(spark, sf_dir, "lineitem")
    bls_shaped = li.select(
        F.concat(
            F.lit("PRS"),
            F.lpad(F.col("l_suppkey").cast("string"), 8, "0"),
            F.lit("  "),  # padded like the raw BLS TSV
        ).alias("series_id"),
        F.year("l_shipdate").alias("year"),
        F.concat(F.lit("Q0"), F.quarter("l_shipdate").cast("string")).alias("period"),
        F.col("l_quantity").alias("value"),
    )
    cleaned = trim_string_columns(bls_shaped)
    # pre-aggregate to per-(series, year, period) observations with the
    # stable decimal sum, mirroring one BLS row per period
    obs = cleaned.groupBy("series_id", "year", "period").agg(
        dsum("value").alias("value")
    )
    return best_years(obs)


@register(
    "q_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      WHERE l_partkey < 2000 AND l_quantity > 0
      GROUP BY l_partkey, l_suppkey
    ), ranked AS (
      SELECT *, MIN(unit_cost) OVER (PARTITION BY l_partkey) AS best
      FROM costs
    )
    SELECT l_partkey, l_suppkey, unit_cost
    FROM ranked WHERE unit_cost = best
    """,
    doc="TPC-H Q2 shape (min-cost supplier): per-(part, supplier) min "
    "unit price, then the suppliers achieving each part's minimum — the "
    "correlated-min-subquery pattern as one agg + a per-part window min "
    "(ties keep all suppliers). Raw double division both sides: "
    "bit-identical IEEE ops, no rounding. Ref: the reference has no "
    "multi-level correlated shapes; this extends J1/A5-A7 coverage.",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_partkey") < 2000) & (F.col("l_quantity") > 0)
    )
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey")
    return (
        costs.withColumn("best", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("best"))
        .select("l_partkey", "l_suppkey", "unit_cost")
    )


@register(
    "q_order_priority_check",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape: orders in a quarter with at least one lineitem "
    "shipped >90 days after order date (EXISTS as a LEFT SEMI join with "
    "an equi key + non-equi residual), counted per priority. The semi "
    "join deduplicates multi-lineitem orders inside the join, no "
    "distinct needed; both sides hash-partition on orderkey.",
)
def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    # derived pushdown: o_orderdate >= 1996-01-01 and the +90-day residual
    # together imply l_shipdate > 1996-03-31, so the fact scan can prune
    # on a literal Catalyst can't infer across the join
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .filter(F.col("l_shipdate") > F.lit("1996-03-31").cast("timestamp"))
    )
    cond = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_linestatus_priority_counts",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape: fact-fact join (lineitem year slice x orders) "
    "with conditional CASE aggregation splitting counts by priority "
    "class. Shuffle join on orderkey (both sides fact-sized; AQE picks "
    "the strategy), then a 2-group aggregate. SUMs CAST to BIGINT for "
    "cross-engine type parity (DuckDB integer SUM is HUGEINT).",
)
def q_linestatus_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: customer order-count distribution via LEFT "
    "OUTER join with a predicate inside the join condition (not a "
    "post-filter — customers with only urgent orders must count 0), "
    "COUNT(nullable) per customer, then a second tiny aggregation over "
    "counts. Two shuffles; the second key space is O(max orders/cust).",
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders_f = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    cond = (cust.c_custkey == orders_f.o_custkey) & (
        orders_f.o_orderpriority != "1-URGENT"
    )
    return (
        cust.join(orders_f, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q_promo_revenue",
    oracle=f"""
    SELECT
      100.0 * {o_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")}
        / {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS promo_pct,
      {o_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END")} AS promo_revenue,
      {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS total_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    doc="TPC-H Q14 shape: promotion revenue share — join lineitem month "
    "slice to part, conditional revenue ratio. Part scales with SF so no "
    "broadcast hint (AQE decides from runtime size); both conditional "
    "sums are exact decimal, the final ratio one deterministic double "
    "division.",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            dsum(promo).alias("promo_revenue"),
            dsum(rev).alias("total_revenue"),
        )
        .select(
            (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
                "promo_pct"
            ),
            "promo_revenue",
            "total_revenue",
        )
    )


@register(
    "q_small_quantity_revenue",
    oracle=f"""
    WITH avgs AS (
      SELECT l_partkey, {o_davg('l_quantity')} AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {o_dsum('l.l_extendedprice')} / 7.0 AS avg_yearly,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avgs a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13' AND l.l_quantity < 0.2 * a.avg_qty
    """,
    doc="TPC-H Q17 shape: revenue from small-quantity orders of one "
    "brand — the correlated per-part AVG subquery decorrelated into a "
    "grouped aggregate joined back to the fact on partkey. The avg uses "
    "the exact decimal-sum convention so the 0.2*avg threshold is "
    "bit-identical across engines; the brand filter prunes after the "
    "partkey join (AQE broadcast candidate).",
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    avgs = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        davg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avgs, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q_disjunctive_filter_revenue",
    oracle=f"""
    SELECT {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#18' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: disjunction of brand/size/quantity conjunction "
    "bands as a post-join residual. Catalyst extracts the common "
    "partkey equi-key for the hash join and pushes the "
    "brand-OR / quantity-OR envelopes down to each scan "
    "(constraint propagation from the disjunction).",
)
def q_disjunctive_filter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    band = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#18")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(band)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q_idle_rich_customers",
    oracle=f"""
    SELECT c.c_nationkey, COUNT(*) AS n_cust,
           {o_dsum('c.c_acctbal')} AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT {o_davg('c_acctbal')} FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 shape: above-average-balance customers with no "
    "recent orders, per nation — a scalar aggregate subquery (1-row broadcast "
    "cross join) plus a LEFT ANTI join against the orders fact. The "
    "anti join shuffles only (custkey) pairs; the scalar avg is exact "
    "decimal so the threshold matches bitwise.",
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    avg_row = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_row))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"), dsum("c_acctbal").alias("total_bal"))
    )
