"""Event-interval joins and deterministic regression aggregates.

The interval join (click ↔ purchase within an hour, per user) is the
batch twin of a watermarked stream-stream join (tests/test_stream.py
exercises the streaming form). At scale both sides bucket by
(user, time-bucket) so the join never goes quadratic: a 1-hour interval
spans at most 2 adjacent buckets, turned into an equi-join on the
bucket id — the same trick Spark's streaming join uses internally with
watermark-bounded state."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blspark.catalog import load_table, register


@register(
    "q_events_interval_join",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS delay_us
    FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'click') c
    JOIN (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'purchase') p
      ON p.user_id = c.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL '1 hour'
    """,
    doc="Interval join: purchases within 1 hour after a click, per user "
    "— the batch twin of a watermarked stream-stream join. Equi-key on "
    "user bounds the match set; time predicate prunes the rest.",
    bench=True,
)
def q_events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    delay = (
        F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("c_ts"))
    ).cast("bigint")
    return joined.select(
        "user_id", "click_id", "purchase_id", delay.alias("delay_us")
    )


# Deterministic regression: x stays EXACT integer microseconds end-to-end
# (casting the seconds-double to DECIMAL(,6) would round values sitting
# exactly on 6-decimal halves — engine-dependent); every sum is an exact
# decimal, and the final slope/intercept are double expressions over
# those exact inputs. Slope is per-microsecond — rescale at the end.
_REG_X_US = "CAST(epoch_us(ts) - 1704067200000000 AS BIGINT)"  # µs since 2024-01-01


def _reg_oracle() -> str:
    from blspark.catalog import o_d2d

    # string round-trip: these scaled sums exceed 2^53 at sf>=0.1, where
    # DuckDB's direct decimal->double cast is off by one ulp vs Java
    sx = o_d2d("SUM(CAST(x AS DECIMAL(28,0)))")
    sy = o_d2d("SUM(CAST(y AS DECIMAL(28,6)))")
    sxx = o_d2d("SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))")
    sxy = o_d2d("SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(18,6)))")
    n = "CAST(COUNT(*) AS DOUBLE)"
    slope_us = f"(({n} * {sxy} - {sx} * {sy}) / ({n} * {sxx} - {sx} * {sx}))"
    return f"""
    WITH xy AS (
      SELECT event_type, {_REG_X_US} AS x, value AS y FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           {slope_us} * 1000000.0 AS slope,
           ({sy} - {slope_us} * {sx}) / {n} AS intercept
    FROM xy GROUP BY event_type
    """


@register(
    "q_regression_stats",
    oracle=_reg_oracle(),
    doc="Per-group least-squares slope/intercept of value over time, "
    "computed from exact decimal sums (n·Σxy − ΣxΣy)/(n·Σx² − (Σx)²) — "
    "order-independent, unlike built-in regr_slope over raw doubles.",
)
def q_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = (F.unix_micros("ts") - F.lit(1704067200000000)).alias("x")  # exact µs
    xy = ev.select("event_type", x, F.col("value").alias("y"))
    x0 = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(18,6)")
    agg = xy.groupBy("event_type").agg(
        F.count("*").alias("n_l"),
        F.sum(F.col("x").cast("decimal(28,0)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(28,6)")).cast("double").alias("sy"),
        F.sum(x0 * x0).cast("double").alias("sxx"),
        F.sum(x0 * yd).cast("double").alias("sxy"),
    )
    n = F.col("n_l").cast("double")
    slope_us = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        "event_type",
        F.col("n_l").alias("n"),
        (slope_us * 1000000.0).alias("slope"),
        ((F.col("sy") - slope_us * F.col("sx")) / n).alias("intercept"),
    )


CHUNK_ORACLE = """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
chunks AS (
  SELECT doc_id,
         CAST(i AS INT) AS chunk_idx,
         array_to_string(t[i * 40 + 1 : i * 40 + 50], ' ') AS chunk_text
  FROM tok, UNNEST(range((len(t) + 39) // 40)) u(i)
  WHERE i * 40 < len(t)
)
SELECT doc_id, chunk_idx, chunk_text,
       CAST(len(string_split(chunk_text, ' ')) AS INT) AS n_tokens
FROM chunks
"""


@register(
    "x_text_chunk_windows",
    oracle=CHUNK_ORACLE,
    doc="RAG-style document chunking: 50-token windows with stride 40 "
    "(10-token overlap) via sequence+transform+explode — map-side only, "
    "the shape for feeding 100 TB of documents to an embedder.",
)
def x_text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.col("_toks")
    n_chunks = F.ceil(F.size(toks) / F.lit(40)).cast("int")
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                F.concat_ws(
                    " ", F.slice(toks, (i * 40 + 1).cast("int"), 50)
                ).alias("chunk_text"),
            ),
        )
    )
    return (
        docs.select("doc_id", F.split("text", " ").alias("_toks"))
        .select("doc_id", chunk.alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.size(F.split(F.col("c.chunk_text"), " ")).alias("n_tokens"),
        )
    )
