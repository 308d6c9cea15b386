"""Round-4 (fifth-batch) extension operators: temporal dimension
lookup (SCD2 as-of join), event-transition matrices, hashing-trick
featurization, and class-balance weights.

Scale design notes (100 TB lens):
- Temporal dimension join: the fact-to-versioned-dimension lookup that
  follows SCD2 maintenance (q_scd2_merge) — equi-join on the key with
  a validity-range residual predicate. The join stays a plain keyed
  shuffle/broadcast join (range residual evaluated post-match); at
  most one version matches per fact row by construction (versions
  partition time), so no fan-out.
- Event transitions: one window (lag) per user partition + one global
  count aggregate keyed by |event_type|² — the Markov-chain summary of
  behavioral streams. Transition probabilities are per-row rationals
  over integer counts: engine-deterministic.
- Feature hashing: the hashing trick (token -> md5-derived bucket mod
  D) — fixed-width feature space independent of vocabulary size, pure
  map-side expression + one (doc, bucket) aggregate; collisions are
  part of the contract. The exploded (doc_id, bucket, cnt) form IS the
  sparse vector, shuffled only by its nonzeros.
- Class weights: inverse-frequency balancing (N / (K * n_k)) — one
  tiny aggregate, exact integer inputs, the standard loss-weighting
  table shipped to trainers alongside a stratified corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blspark.catalog import load_table, o_dsum, register, dsum

# ---------------------------------------------------------------------------
# Temporal dimension lookup (SCD2 as-of join)
# ---------------------------------------------------------------------------

_V2_FROM = "1995-07-01"


@register(
    "q_scd2_temporal_join",
    oracle=f"""
    WITH dim AS (
      SELECT c_custkey AS key, c_mktsegment AS segment,
             DATE '1992-01-01' AS valid_from,
             CASE WHEN c_custkey % 5 = 0 THEN DATE '{_V2_FROM}' - 1
                  ELSE DATE '9999-12-31' END AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, 'UPGRADED', DATE '{_V2_FROM}', DATE '9999-12-31'
      FROM customer WHERE c_custkey % 5 = 0
    )
    SELECT d.segment AS segment_at_order,
           COUNT(*) AS n_orders,
           {o_dsum('o.o_totalprice')} AS total_price
    FROM orders o
    JOIN dim d ON d.key = o.o_custkey
              AND o.o_orderdate BETWEEN d.valid_from AND d.valid_to
    GROUP BY d.segment
    """,
    doc="Temporal dimension lookup — the fact-to-SCD2 as-of join that "
    "consumes the history q_scd2_merge maintains: each order joins the "
    "dimension VERSION valid at its order date (equi-join on the key "
    "plus a validity-range residual; versions partition time, so "
    "exactly one matches — no fan-out). The point-in-time-correct "
    "attribution every warehouse rollup needs once dimensions change "
    "under it.",
)
def q_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    v2_from = F.to_date(F.lit(_V2_FROM))
    v1 = cust.select(
        F.col("c_custkey").alias("key"),
        F.col("c_mktsegment").alias("segment"),
        F.to_date(F.lit("1992-01-01")).alias("valid_from"),
        F.when(
            F.col("c_custkey") % 5 == 0, F.date_sub(v2_from, 1)
        )
        .otherwise(F.to_date(F.lit("9999-12-31")))
        .alias("valid_to"),
    )
    v2 = cust.filter(F.col("c_custkey") % 5 == 0).select(
        F.col("c_custkey").alias("key"),
        F.lit("UPGRADED").alias("segment"),
        v2_from.alias("valid_from"),
        F.to_date(F.lit("9999-12-31")).alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    joined = orders.join(
        dim,
        (F.col("o_custkey") == F.col("key"))
        & (F.col("o_orderdate") >= F.col("valid_from"))
        & (F.col("o_orderdate") <= F.col("valid_to")),
    )
    return joined.groupBy(F.col("segment").alias("segment_at_order")).agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Event-transition matrix (behavioral Markov chain)
# ---------------------------------------------------------------------------


@register(
    "x_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS prev_type
      FROM events
    ),
    cnt AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY prev_type) AS p
    FROM cnt
    """,
    doc="Event-transition matrix: per-user event streams ordered by "
    "(ts, event_id), lagged into (prev -> next) transitions, counted "
    "globally with per-source-state probabilities — the first-order "
    "Markov summary behind funnel diagnostics and anomalous-flow "
    "detection. One per-user window + one |event_type|^2-keyed "
    "aggregate; probabilities are integer-ratio doubles.",
)
def x_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    cnt = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    wp = Window.partitionBy("prev_type")
    return cnt.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wp)).alias("p"),
    )


# ---------------------------------------------------------------------------
# Hashing-trick featurization
# ---------------------------------------------------------------------------

_HASH_DIM = 64


def _feature_hash_oracle() -> str:
    from blspark.ext.dedup import hex_int_sql

    # digest computed ONCE into a column (hex_int_sql would otherwise
    # inline one md5 call per nibble)
    bucket = f"({hex_int_sql('h', 6)}) % {_HASH_DIM}"
    return f"""
    WITH w AS (
      SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id, CAST({bucket} AS INT) AS bucket, COUNT(*) AS cnt
    FROM w GROUP BY doc_id, {bucket}
    """


@register(
    "x_feature_hashing",
    oracle=_feature_hash_oracle(),
    doc=f"Hashing-trick featurization: tokens map to a fixed "
    f"{_HASH_DIM}-bucket feature space via an md5-derived bucket "
    "(engine-portable hex arithmetic, no vocabulary table at all — "
    "the property that makes the trick work on unbounded streams). "
    "Emitted as the exploded sparse form (doc_id, bucket, cnt): pure "
    "map-side hashing + one aggregate keyed by nonzeros. Collisions "
    "are part of the estimator's contract; dimension is the "
    "accuracy/width lever.",
)
def x_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.dedup import hex_int_sql

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    )
    w = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).select("doc_id", F.md5(F.col("tok").cast("binary")).alias("h"))
    bucket = (F.expr(hex_int_sql("h", 6)) % _HASH_DIM).cast("int")
    return (
        w.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Class-balance weights
# ---------------------------------------------------------------------------


@register(
    "x_class_weights",
    oracle="""
    WITH c AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
    s AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS k FROM c)
    SELECT c.label, c.n,
           CAST(s.total AS DOUBLE) / (s.k * c.n) AS weight
    FROM c CROSS JOIN s
    """,
    doc="Class-balance weights: inverse-frequency loss weighting "
    "w_k = N / (K * n_k) over the embeddings labels — the table a "
    "trainer consumes next to a stratified corpus so rare classes "
    "are not drowned. One tiny aggregate + broadcast of the (N, K) "
    "scalars; exact integer inputs make the weights deterministic.",
)
def x_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.groupBy("label").agg(F.count("*").alias("n"))
    s = c.agg(
        F.sum("n").cast("bigint").alias("total"), F.count("*").alias("k")
    )
    return c.crossJoin(F.broadcast(s)).select(
        "label",
        "n",
        (F.col("total").cast("double") / (F.col("k") * F.col("n"))).alias(
            "weight"
        ),
    )


# ---------------------------------------------------------------------------
# Event-time RANGE window frame (value-based, not row-count-based)
# ---------------------------------------------------------------------------


def _time_range_oracle() -> str:
    from blspark.catalog import o_d2d

    s = "SUM(CAST(value AS DECIMAL(28,4))) OVER w"
    return f"""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           {o_d2d(s)} AS sum_1h
    FROM (SELECT event_id, user_id, value,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events WHERE event_id < 10000)
    WINDOW w AS (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """


@register(
    "q_window_time_range",
    oracle=_time_range_oracle(),
    doc="Event-time RANGE window frame: per user, the count and exact "
    "decimal sum of events in the trailing ONE HOUR of event time "
    "(RANGE over epoch microseconds — value-based framing, where "
    "q_window_moving_avg's ROWS frame counts rows). RANGE frames are "
    "what sliding time-window features actually need: two events a "
    "week apart are NOT neighbors just because they're adjacent rows. "
    "Partition-bounded sort; micros keep the frame boundary "
    "integer-exact in both engines (a seconds cast would truncate).",
)
def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.catalog import DEC

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 10000)
        .select(
            "event_id", "user_id", "value", F.unix_micros("ts").alias("us")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias(
            "sum_1h"
        ),
    )


# ---------------------------------------------------------------------------
# XML source/sink round trip (Spark 4 built-in XML)
# ---------------------------------------------------------------------------


@register(
    "x_xml_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT md5(text)) AS n_distinct_texts
    FROM documents WHERE doc_id < 300
    """,
    doc="XML source/sink round trip (Spark 4 built-in XML, absorbing "
    "the former spark-xml package): a documents slice is written as "
    "rowTag XML and read back, then summarized by count / exact char "
    "total / distinct content digests — the oracle computes the same "
    "over the original parquet rows, so any loss or mangling in the "
    "XML writer/parser round trip breaks the hash. Completes the "
    "format matrix next to CSV/JSON/ORC/zstd-parquet in "
    "tests/test_formats.py. The reader disables "
    "ignoreSurroundingSpaces (the default true would silently trim "
    "leading/trailing whitespace off text nodes — and collapse empty "
    "strings to null — breaking the digest differential on "
    "whitespace-padded corpora); both edge shapes are pinned in "
    "tests/test_formats.py::test_xml_whitespace_and_empty_text.",
)
def x_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 300
    )
    d = tempfile.mkdtemp(prefix="blspark_xml_")
    try:
        docs.write.format("xml").option("rowTag", "doc").mode(
            "overwrite"
        ).save(f"{d}/docs")
        back = (
            spark.read.format("xml")
            .option("rowTag", "doc")
            .option("ignoreSurroundingSpaces", "false")
            .load(f"{d}/docs")
        )
        out = back.agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.count_distinct(
                F.md5(F.col("text").cast("binary"))
            ).alias("n_distinct_texts"),
        )
        # materialize before the temp dir disappears
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Bidirectional nearest-in-time join (as-of, either direction)
# ---------------------------------------------------------------------------


@register(
    "q_asof_nearest_click",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    marked AS (
      SELECT event_id, user_id, event_type, us,
             last_value(CASE WHEN event_type = 'click' THEN us END
                        IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_us,
             first_value(CASE WHEN event_type = 'click' THEN us END
                         IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
             ) AS next_us
      FROM ev
    )
    SELECT event_id, user_id,
           CASE WHEN next_us IS NULL THEN us - prev_us
                WHEN prev_us IS NULL THEN next_us - us
                WHEN us - prev_us <= next_us - us THEN us - prev_us
                ELSE next_us - us END AS delta_us,
           CASE WHEN next_us IS NULL THEN 'before'
                WHEN prev_us IS NULL THEN 'after'
                WHEN us - prev_us <= next_us - us THEN 'before'
                ELSE 'after' END AS dir
    FROM marked
    WHERE event_type = 'purchase'
      AND (prev_us IS NOT NULL OR next_us IS NOT NULL)
    """,
    doc="Bidirectional nearest-in-time join: each purchase is matched "
    "to its NEAREST click of the same user in EITHER time direction "
    "(ties -> the earlier one) — the symmetric generalization of "
    "q_asof_prev_order's backward-only as-of, done with two "
    "IGNORE-NULLS window scans over the merged per-user stream "
    "instead of any join at all (the merge-scan formulation that "
    "makes as-of joins cheap at scale: one partition-bounded sort, "
    "zero shuffle beyond it). Deltas are epoch-microsecond integers — "
    "exact in both engines.",
)
def q_asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("us"),
        )
    )
    base = Window.partitionBy("user_id").orderBy("us", "event_id")
    click_us = F.when(F.col("event_type") == "click", F.col("us"))
    prev_us = F.last(click_us, ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_us = F.first(click_us, ignorenulls=True).over(
        base.rowsBetween(1, Window.unboundedFollowing)
    )
    marked = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "us",
        prev_us.alias("prev_us"),
        next_us.alias("next_us"),
    )
    d_prev = F.col("us") - F.col("prev_us")
    d_next = F.col("next_us") - F.col("us")
    return (
        marked.filter(F.col("event_type") == "purchase")
        .filter(F.col("prev_us").isNotNull() | F.col("next_us").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.when(F.col("next_us").isNull(), d_prev)
            .when(F.col("prev_us").isNull(), d_next)
            .when(d_prev <= d_next, d_prev)
            .otherwise(d_next)
            .alias("delta_us"),
            F.when(F.col("next_us").isNull(), F.lit("before"))
            .when(F.col("prev_us").isNull(), F.lit("after"))
            .when(d_prev <= d_next, F.lit("before"))
            .otherwise(F.lit("after"))
            .alias("dir"),
        )
    )
