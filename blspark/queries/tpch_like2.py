"""Second batch of TPC-H plan shapes (Q6/Q8/Q9/Q11/Q15/Q16/Q20/Q21)
adapted to the simplified star schema (no partsupp, no commit/receipt
dates). Together with ``tpch_like.py`` this covers all 22 classic shapes
that are expressible over these tables — exercising scan-only pushdown,
8-way snowflake joins, ratio-of-conditional-sums, HAVING vs a global
scalar, max-over-aggregate, NOT-IN + COUNT DISTINCT, nested semi-join
chains, and double-correlated EXISTS/NOT-EXISTS self-joins.

The reference pipeline (report_processor.py) has only single-join
reports; these extend SURVEY.md §2.3/§2.4 join and aggregate coverage to
the topologies a warehouse workload needs at 100 TB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blspark.catalog import dsum, load_table, o_dsum, register


@register(
    "q_forecast_revenue",
    oracle=f"""
    SELECT {o_dsum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24.0
    """,
    doc="TPC-H Q6 shape: pure scan-side revenue forecast — every "
    "predicate (date range, discount band, quantity cap) pushes into the "
    "parquet scan, zero joins, one partial+final aggregate. The minimal "
    "query: at 100 TB its cost is IO-bound and linear in surviving "
    "row-groups (min/max pruning on l_shipdate).",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.04)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count("*").alias("n_rows"),
    )


@register(
    "q_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'AMERICA'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    )
    SELECT o_year,
           {o_dsum("CASE WHEN supp_nation = 'NATION_6' THEN volume ELSE 0.0 END")}
             / {o_dsum('volume')} AS mkt_share,
           {o_dsum('volume')} AS total_volume
    FROM vol
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: NATION_6 suppliers' market share of ECONOMY "
    "parts sold to AMERICA-region customers, per order year. An 8-way "
    "snowflake join — the fact joins orders (fact-fact shuffle on "
    "orderkey), every dimension chain is broadcast (nation/region "
    "constant-sized; part/supplier/customer AQE-sized). Share = ratio of "
    "two exact decimal sums, one deterministic double division.",
    bench=True,  # the widest join plan in the registry — benched r4+
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    supp = load_table(spark, sf_dir, "supplier")

    # customer-side dim chain: customers in AMERICA (broadcast at any SF
    # where customer ≪ fact; AQE demotes to shuffle if not)
    cust_dim = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("c_custkey")
    )
    # supplier-side dim chain carries the supplier nation name
    supp_nat = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    supp_dim = supp.join(
        F.broadcast(supp_nat), supp.s_nationkey == F.col("sn_key")
    ).select("s_suppkey", "supp_nation")

    vol = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(cust_dim, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_dim, li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_6", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return (
        vol.groupBy("o_year")
        .agg(
            dsum(nation_vol).alias("nation_volume"),
            dsum("volume").alias("total_volume"),
        )
        .select(
            "o_year",
            (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
            "total_volume",
        )
        .orderBy("o_year")
    )


@register(
    "q_product_profit",
    oracle=f"""
    SELECT sn.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount) - 0.5 * p.p_retailprice * l.l_quantity')} AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    GROUP BY sn.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INT)
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: profit on widget parts per supplier nation and "
    "order year. No partsupp table in this schema, so supply cost is "
    "modeled as 0.5 * p_retailprice (same join topology, same "
    "profit-expression shape). The profit expression is evaluated in "
    "IEEE doubles identically on both engines (mul-before-sub, "
    "left-assoc), then decimal-summed for order independence.",
    bench=True,  # heaviest 5-join profit plan — benched r4+
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part.select("p_partkey", "p_retailprice"),
                li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit).alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q_important_parts",
    oracle=f"""
    WITH v AS (
      SELECT l.l_partkey,
             {o_dsum('l.l_extendedprice * l.l_quantity')} AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_0'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, value
    FROM v
    WHERE value > (SELECT {o_dsum('value')} * 0.001 FROM v)
    ORDER BY value DESC, l_partkey
    """,
    doc="TPC-H Q11 shape: parts whose NATION_0-supplied value exceeds "
    "0.1% of that nation's total — grouped aggregate reused for both the "
    "per-part values and the global threshold (the scalar subquery is a "
    "1-row broadcast, the HAVING a post-agg filter). The grouped "
    "frame's shuffle is computed once — verified at runtime: the "
    "threshold branch shows ReusedExchange over the per-part aggregate "
    "exchange. The re-sum over already-exact doubles goes through "
    "decimals again so both engines agree bitwise.",
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    v = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat.select("n_nationkey")),
              supp.s_nationkey == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    threshold = v.agg((dsum("value") * F.lit(0.001)).alias("thr"))
    return (
        v.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("thr"))
        .select("l_partkey", "value")
        .orderBy(F.desc("value"), F.asc("l_partkey"))
    )


@register(
    "q_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, {o_dsum('l_extendedprice * (1 - l_discount)')} AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 shape: the quarter's top-revenue supplier(s) — the "
    "classic CREATE-VIEW + scalar-MAX formulation as one grouped "
    "aggregate consumed twice (per-supplier revenues; their max as a "
    "1-row broadcast). Ties keep all achieving suppliers, matching the "
    "spec. The revenue frame shuffles on suppkey once; the max is a "
    "partial-agg reduction, not a sort.",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev")
    )
    best = rev.agg(F.max("total_rev").alias("best_rev"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_rev") == F.col("best_rev"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@register(
    "q_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape: distinct supplier counts per (brand, type, "
    "size) over a negated-filter part slice, excluding flagged suppliers "
    "(negative balance stands in for the spec's complaint list; no "
    "partsupp, so lineitem provides the part-supplier pairs). NOT IN "
    "compiles to a broadcast LEFT ANTI join (s_suppkey is never null); "
    "COUNT(DISTINCT) expands to a two-phase exact distinct aggregate.",
)
def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    flagged = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(flagged), li.l_suppkey == flagged.s_suppkey, "left_anti")
        .join(part.select("p_partkey", "p_brand", "p_type", "p_size"),
              li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q_promotion_suppliers",
    oracle=f"""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey, {o_dsum('l_quantity')} AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT sh.l_suppkey
      FROM shipped sh
      JOIN part p ON p.p_partkey = sh.l_partkey
      WHERE p.p_name LIKE 'red%' AND sh.qty > 60.0)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q20 shape: suppliers who moved >60 units of any red part "
    "in 1996 — a nested semi-join chain (year-sliced fact aggregate → "
    "part-name semi filter → IN as LEFT SEMI against supplier). The "
    "grouped frame shuffles on (suppkey, partkey); the part filter is a "
    "broadcast; supplier sees only a distinct-suppkey semi probe.",
)
def q_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    red_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    shipped = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(dsum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 60.0)
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supp.join(shipped, supp.s_suppkey == shipped.l_suppkey, "left_semi")
        .orderBy("s_suppkey")
    )


@register(
    "q_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
    doc="TPC-H Q21 shape (adapted: no receipt/commit dates — 'the "
    "supplier whose item shipped last' replaces 'the supplier who "
    "missed commit'): double-correlated EXISTS / NOT EXISTS self-joins "
    "on the fact, compiled to a LEFT SEMI then LEFT ANTI join, each "
    "shuffling on orderkey with a non-equi residual. All three fact "
    "sides co-partition on orderkey, so AQE can reuse the exchange; "
    "counts roll up per supplier name at the end.",
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    waiting = (
        l1.join(orders_f, l1.l_orderkey == orders_f.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3"))
            & (F.col("d3") > F.col("l_shipdate")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(supp), waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )
