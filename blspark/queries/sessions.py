"""Session-window operators: batch session_window (oracle-checked),
stateful streaming sessionization via applyInPandasWithState, and
approximate sketches."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blspark.catalog import load_table, normalize_event_ts, register


@register(
    "q_events_session_window",
    oracle="""
    WITH ev AS (
      -- truncate to microseconds: events.parquet stores TIMESTAMP(NANOS);
      -- Spark reads micros-truncated, so gap tests and outputs must agree
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
    ), marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="Native session_window aggregation (30-min gap): F.session_window "
    "merges adjacent events into [first_ts, last_ts + gap) sessions — "
    "the batch twin of streaming sessionization. Oracle re-derives the "
    "same windows via lag/cumsum.",
)
def q_events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def approx_sketches_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw sketch outputs (engine-specific values): HLL++ distinct counts
    + approximate percentiles. tests/test_sessions.py asserts accuracy
    against exact DuckDB answers."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    approx = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
    )
    pct = orders.agg(
        F.percentile_approx("o_totalprice", [0.5, 0.95], 10000).alias("price_pct")
    ).select(
        F.col("price_pct")[0].alias("p50_price"),
        F.col("price_pct")[1].alias("p95_price"),
    )
    return approx.crossJoin(pct)


@register(
    "x_approx_sketches",
    oracle="""
    SELECT (SELECT COUNT(DISTINCT l_partkey) FROM lineitem) AS exact_parts,
           (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS exact_orders,
           TRUE AS parts_err_ok, TRUE AS orders_err_ok,
           TRUE AS p50_ok, TRUE AS p95_ok
    """,
    doc="Approximate sketches: HyperLogLog++ distinct counts and "
    "quantile summaries — the O(1)-memory scale path for cardinality/"
    "percentile over 100 TB. Sketch internals are engine-specific, so "
    "the registered form hashes a deterministic CONTRACT row (the "
    "x_hll_partial_merge device): the exact cardinalities (hard "
    "values, oracle-checked) plus booleans pinning each sketch inside "
    "its error envelope — HLL++ within 15% (3x the default 5% rsd) of "
    "exact, approx percentiles inside the exact p40–p60 / p90–p99 "
    "value bands (computed in-plan via exact percentile). Raw sketch "
    "values: approx_sketches_raw; accuracy vs DuckDB exact answers in "
    "tests/test_sessions.py.",
)
def x_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    card = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )
    pct = orders.agg(
        F.percentile_approx("o_totalprice", [0.5, 0.95], 10000).alias("apx"),
        F.expr(
            "percentile(o_totalprice, array(0.40D, 0.60D, 0.90D, 0.99D))"
        ).alias("ex"),
    )
    return card.crossJoin(pct).select(
        "exact_parts",
        "exact_orders",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            / F.col("exact_parts")
            <= 0.15
        ).alias("parts_err_ok"),
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            / F.col("exact_orders")
            <= 0.15
        ).alias("orders_err_ok"),
        F.col("apx")[0].between(F.col("ex")[0], F.col("ex")[1]).alias("p50_ok"),
        F.col("apx")[1].between(F.col("ex")[2], F.col("ex")[3]).alias("p95_ok"),
    )


@register(
    "s_stream_sessionize_stateful",
    oracle="""
    WITH ev_us AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM ev_us
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM gaps GROUP BY user_id
    """,
    doc="Custom stateful streaming operator via applyInPandasWithState: "
    "per-user session counting with 30-minute gap timeout, state = "
    "(last_ts, session count) per user. Full oracle (availableNow "
    "drain is deterministic); tests/test_sessions.py proves "
    "equivalence to the batch q_events_sessionize.",
)
def s_stream_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.format("parquet")
        .schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    stream = normalize_event_ts(stream)

    GAP_US = 30 * 60 * 1_000_000

    def count_sessions(key, pdfs, state: GroupState):
        total_events = 0
        ts_us: list[int] = []
        for pdf in pdfs:
            total_events += len(pdf)
            ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        ts_us.sort()
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = -1, 0, 0
        for t in ts_us:
            if last_ts < 0 or t - last_ts > GAP_US:
                n_sessions += 1
            last_ts = t
        n_events += total_events
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    out = stream.groupBy("user_id").applyInPandasWithState(
        count_sessions,
        outputStructType="user_id long, n_sessions long, n_events long",
        stateStructType="last_ts long, n_sessions long, n_events long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    import uuid

    name = f"blspark_state_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.trigger(availableNow=True)
        .outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


@register(
    "x_sketch_accuracy_checked",
    oracle="""
    SELECT (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) FROM lineitem)
             AS exact_parts,
           (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM lineitem)
             AS exact_orders,
           TRUE AS parts_ok, TRUE AS orders_ok,
           TRUE AS p50_ok, TRUE AS p95_ok
    """,
    doc="Sketch-accuracy contract, hash-checked: exact distinct counts "
    "as values plus Spark-computed booleans asserting the HLL++ "
    "estimates land within 10% of exact and percentile_approx(1e4) "
    "within 5% of the exact interpolated percentile. The oracle "
    "recomputes the exact counts and expects every contract boolean "
    "TRUE — a hard driver row for the sketch family (sketch internals "
    "differ across engines, so the raw estimates themselves stay in "
    "x_approx_sketches' raw twin approx_sketches_raw). HLL bounds: rsd=0.05 default, "
    "observed error ~2%; approx-percentile rank error <= N/accuracy.",
)
def x_sketch_accuracy_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    within = lambda approx, exact, tol: (  # noqa: E731
        F.abs(approx - exact) <= tol * F.abs(exact)
    )
    counts = li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_partkey").alias("ap"),
        F.approx_count_distinct("l_orderkey").alias("ao"),
    )
    pct = orders.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("e50"),
        F.expr("percentile(o_totalprice, 0.95)").alias("e95"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("a50"),
        F.percentile_approx("o_totalprice", F.lit(0.95), F.lit(10000)).alias("a95"),
    )
    return counts.crossJoin(pct).select(
        "exact_parts",
        "exact_orders",
        within(F.col("ap"), F.col("exact_parts"), 0.10).alias("parts_ok"),
        within(F.col("ao"), F.col("exact_orders"), 0.10).alias("orders_ok"),
        within(F.col("a50"), F.col("e50"), 0.05).alias("p50_ok"),
        within(F.col("a95"), F.col("e95"), 0.05).alias("p95_ok"),
    )
