"""Round-3 extension operators: BM25 + TF-IDF retrieval scoring, PII
redaction, per-source corpus caps, Spark-4 VariantType JSON access, a
Python UDTF, one-pass table profiling, stream packing (two-level
distributed prefix sum), mixture-epoch resampling, and SCD2
dimension-history merge — the
curation/retrieval surface a training-data pipeline runs on top of the
dedup/quality stages in ``extensions.py``.

Scale design notes (100 TB lens):
- BM25: corpus statistics (N, avgdl, per-term df) are tiny aggregates
  broadcast back onto the map-side tf stream; the fact table never
  shuffles except the final per-term top-k window, whose key space is
  |terms|, not |docs|. This is the standard two-pass distributed BM25.
- PII redaction: pure Catalyst regexp expressions, codegen into the
  scan, zero shuffle — runs at full scan bandwidth.
- Source caps: one window keyed by source; skewed mega-sources are the
  known hazard — cap with a pre-filter on a per-source quality
  threshold (computed via approx_percentile) before the exact window
  when a single source exceeds executor memory.
- Variant: Spark 4's binary-encoded VariantType replaces per-access
  JSON string re-parsing; parse once, then typed variant_get accesses
  are struct-speed. The oracle mirrors semantics over the raw JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blspark.catalog import load_table, register

# ---------------------------------------------------------------------------
# BM25 retrieval scoring
# ---------------------------------------------------------------------------

BM25_TERMS = ["spark", "hash", "window", "merge"]
_K1 = 1.2
_B = 0.75

_TERMS_VALUES = ", ".join(f"('{t}')" for t in BM25_TERMS)

BM25_ORACLE = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS dl
  FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM d
),
terms(term) AS (VALUES {_TERMS_VALUES}),
tf AS (
  SELECT d.doc_id, d.dl, terms.term,
         len(list_filter(d.toks, x -> x = terms.term)) AS tf
  FROM d CROSS JOIN terms
),
m AS (SELECT * FROM tf WHERE tf > 0),
dfreq AS (SELECT term, COUNT(*) AS dft FROM m GROUP BY term),
scored AS (
  -- every fractional constant CAST AS DOUBLE: DuckDB parses x.y literals
  -- as DECIMAL, and e.g. tf * 2.2 is then EXACT (15.4) where Spark's
  -- double multiply rounds (15.400000000000002) — a last-ulp hash break
  SELECT m.term, m.doc_id,
         ((stats.n_docs - dfreq.dft + CAST(0.5 AS DOUBLE))
            / (dfreq.dft + CAST(0.5 AS DOUBLE)))
           * ((m.tf * CAST({_K1 + 1.0} AS DOUBLE)) /
              (m.tf + CAST({_K1} AS DOUBLE) *
                 (CAST({1.0 - _B} AS DOUBLE)
                  + (CAST({_B} AS DOUBLE) * m.dl) / stats.avgdl)))
           AS score
  FROM m JOIN dfreq ON m.term = dfreq.term CROSS JOIN stats
)
SELECT term, doc_id, score, CAST(rn AS INT) AS rank FROM (
  SELECT term, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY term
                            ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored
) t WHERE rn <= 10
"""


@register(
    "x_bm25_topk",
    oracle=BM25_ORACLE,
    doc="BM25 (k1=1.2, b=0.75) top-10 docs per query term, idf in "
    "Robertson odds form (ln omitted: idf is a per-term constant, so "
    "ranking is unchanged, and dropping the 1-ulp Math.log keeps the "
    "score bitwise-deterministic cross-engine). Two tiny aggregates "
    "(corpus stats, per-term df) broadcast onto the map-side tf stream; "
    "docs never shuffle except the |terms|-keyed top-k window.",
)
def x_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    d = docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("dl"))
    stats = d.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    per_term = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(t).alias("term"),
                    F.size(
                        F.filter(F.col("toks"), lambda x: x == F.lit(t))
                    ).alias("tf"),
                )
                for t in BM25_TERMS
            ]
        )
    )
    m = (
        d.select("doc_id", "dl", per_term.alias("t"))
        .select("doc_id", "dl", "t.term", "t.tf")
        .filter(F.col("tf") > 0)
    )
    dfreq = m.groupBy("term").agg(F.count("*").alias("dft"))
    # idf kept in Robertson odds form, NOT ln(odds): Java Math.log is
    # 1-ulp (not correctly rounded) and diverges from the oracle's libm
    # on real inputs. idf is constant within a term partition, so the
    # per-term ranking — the operator's contract — is identical; every
    # remaining op is single-rounded IEEE math, bitwise-equal anywhere.
    idf = (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
    score = idf * (
        (F.col("tf") * F.lit(_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(_K1)
            * (F.lit(1.0 - _B) + (F.lit(_B) * F.col("dl")) / F.col("avgdl"))
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        m.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("term", "doc_id", score.alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to the Java-regex ∩ RE2 common subset (no
# backrefs, no lookaround) so Spark and the oracle match identically.
_EMAIL_PAT = "[a-z0-9._]+@[a-z0-9.]+"
_PHONE_PAT = "\\+1-555-[0-9]{4}"

PII_CORPUS_SQL = """
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@mail.example.com or call +1-555-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS text
  FROM documents
"""


@register(
    "x_text_redact_pii",
    oracle=f"""
    WITH corpus AS ({PII_CORPUS_SQL})
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '{_EMAIL_PAT}', '<EMAIL>', 'g'),
             '{_PHONE_PAT}', '<PHONE>', 'g') AS red_text,
           CAST(len(regexp_extract_all(text, '{_EMAIL_PAT}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_PAT}')) AS INT) AS n_phones
    FROM corpus
    """,
    doc="PII scrub pass: plant deterministic emails/phones on every 7th "
    "doc (both engines), then redact via regexp_replace and count "
    "matches. Pure codegen map-side expressions — scan-bandwidth at any "
    "corpus size; patterns kept to the Java-regex ∩ RE2 subset.",
)
def x_text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    text = planted
    red = F.regexp_replace(
        F.regexp_replace(text, _EMAIL_PAT, "<EMAIL>"),
        _PHONE_PAT,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        red.alias("red_text"),
        F.size(F.regexp_extract_all(text, F.lit(_EMAIL_PAT), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(_PHONE_PAT), F.lit(0)))
        .cast("int")
        .alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# per-source corpus caps
# ---------------------------------------------------------------------------


@register(
    "x_source_cap_topk",
    oracle="""
    WITH q AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
    ), scored AS (
      SELECT doc_id, source,
             (LEAST(len(toks) / 100.0, 1.0)
              + len(list_distinct(toks)) / len(toks)) / 2.0 AS quality
      FROM q
    )
    SELECT source, doc_id, quality, CAST(rn AS INT) AS rank FROM (
      SELECT source, doc_id, quality,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id ASC) AS rn
      FROM scored
    ) t WHERE rn <= 20
    """,
    doc="Per-source corpus cap: keep the top-20 docs per source by the "
    "composite quality score (domain balancing, the CommonCrawl-style "
    "per-domain cap). A histogram-based skew pre-filter "
    "(source_cap_prefilter) shrinks each source to ~slack*cap rows "
    "before the exact window, so a mega-source never pushes its full "
    "row count through one window sort.",
)
def x_source_cap_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    quality = (
        F.least(n / F.lit(100.0), F.lit(1.0))
        + F.size(F.array_distinct(toks)) / n
    ) / F.lit(2.0)
    scored = docs.select("source", "doc_id", quality.alias("quality"))
    pruned = source_cap_prefilter(scored, cap=20)
    w = Window.partitionBy("source").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        pruned.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 20)
        .select("source", "doc_id", "quality", "rank")
    )


def source_cap_prefilter(
    scored: DataFrame,
    cap: int,
    slack: int = 4,
    n_bins: int = 10000,
    key_col: str = "source",
    score_col: str = "quality",
) -> DataFrame:
    """Skew pre-filter for per-key top-``cap`` windows: GUARANTEED to
    keep a superset of every key's exact top-``cap`` rows while cutting
    a mega-key's window input from its full row count to roughly
    ``slack * cap`` (+ boundary-bin ties).

    Mechanism (exact, no approx_percentile — a per-key percentile
    fraction cannot even be a constant argument): quantize the score
    into ``n_bins`` histogram bins, count rows per (key, bin) — a tiny,
    fully partial-aggregatable aggregate — take the running count from
    the top bin down, and find each key's highest bin where the running
    count reaches ``slack * cap``. Keeping every row at-or-above that
    bin keeps >= slack*cap rows per key, which necessarily includes the
    exact top-cap (the kept set is upward-closed in score, and ties at
    the boundary share a bin so tie-breaking never loses a row). Keys
    with fewer than slack*cap rows get no threshold and pass through
    whole. Scores are assumed in [0, ~2]; bins clamp via floor().

    The downstream window then sorts ~slack*cap rows per key instead of
    the key's full population — the difference between a mega-source
    serializing 10^9 rows through one partition's sort and a constant-
    size sort, at the cost of one extra small shuffle (keys x bins)."""
    bin_col = F.floor(F.col(score_col) * n_bins).cast("long")
    hist = (
        scored.select(F.col(key_col).alias("_k"), bin_col.alias("_bin"))
        .groupBy("_k", "_bin")
        .agg(F.count("*").alias("_n"))
    )
    wcum = (
        Window.partitionBy("_k")
        .orderBy(F.desc("_bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    thr = (
        hist.withColumn("_cum", F.sum("_n").over(wcum))
        .filter(F.col("_cum") >= slack * cap)
        .groupBy("_k")
        .agg(F.max("_bin").alias("_thr_bin"))
    )
    # no broadcast hint: thr has one row per key and the key domain
    # (e.g. web domains) grows with the corpus — AQE sizes the join
    return (
        scored.join(
            thr,
            scored[key_col] == thr["_k"],
            "left",
        )
        .filter(
            F.col("_thr_bin").isNull() | (bin_col >= F.col("_thr_bin"))
        )
        .drop("_k", "_thr_bin")
    )


# ---------------------------------------------------------------------------
# Spark 4 VariantType JSON access
# ---------------------------------------------------------------------------


@register(
    "x_variant_json",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.k') AS k_str,
           CASE WHEN json_extract_string(props, '$.missing') IS NULL
                THEN TRUE ELSE FALSE END AS missing_is_null
    FROM events WHERE event_id < 2000
    """,
    doc="Semi-structured access via Spark 4 VariantType: parse_json once "
    "into the binary variant encoding, then typed variant_get accesses "
    "(struct-speed, no per-access JSON re-parse — the 100 TB-friendly "
    "way to read event payloads). Oracle mirrors over the raw JSON "
    "string.",
)
def x_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "string").isNull().alias(
            "missing_is_null"
        ),
    )


# ---------------------------------------------------------------------------
# Python UDTF (Spark 4): per-row table function with lateral join
# ---------------------------------------------------------------------------


@register(
    "x_udtf_bigrams",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE doc_id < 200
    )
    SELECT doc_id,
           CAST(i AS INT) AS pos,
           toks[i + 1] || ' ' || toks[i + 2] AS bigram
    FROM t, UNNEST(range(len(toks) - 1)) u(i)
    WHERE len(toks) >= 2
    """,
    doc="Python UDTF (Spark 4 user-defined table function) emitting "
    "(pos, bigram) rows per document via LATERAL join — the API-parity "
    "demo for custom row-expanding operators. NOTE: UDTFs are "
    "row-at-a-time Python; production bigrams use the zip_with/slice "
    "Catalyst path in ext/dedup.py (this exists to cover the API "
    "surface, on a deliberately small slice).",
)
def x_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class Bigrams:
        def eval(self, text: str):
            if text is None:
                return
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield i, toks[i] + " " + toks[i + 1]

    spark.udtf.register("blspark_bigrams", Bigrams)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.bigram
        FROM _udtf_docs d, LATERAL blspark_bigrams(d.text) b
        WHERE d.doc_id < 200
        """
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (top terms per document)
# ---------------------------------------------------------------------------

TFIDF_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
stats AS (SELECT COUNT(*) AS n_docs FROM t),
tf AS (
  SELECT doc_id, tok AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS tok FROM t) raw
  GROUP BY doc_id, tok
),
dfreq AS (SELECT term, COUNT(*) AS dft FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ((stats.n_docs - dfreq.dft + CAST(0.5 AS DOUBLE))
                  / (dfreq.dft + CAST(0.5 AS DOUBLE))) AS weight
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN stats
)
SELECT doc_id, term, weight, CAST(rn AS INT) AS rank FROM (
  SELECT doc_id, term, weight,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY weight DESC, term ASC) AS rn
  FROM scored
) s WHERE rn <= 3
"""


@register(
    "x_tfidf_keywords",
    oracle=TFIDF_ORACLE,
    doc="Per-document keyword extraction: full-vocabulary TF-IDF (idf "
    "in odds form — see x_bm25_topk for why ln is omitted) with top-3 "
    "terms per doc. Shuffles: one (doc,term) count agg, one |vocab|-"
    "keyed df agg (broadcast back), one doc-keyed window. The df "
    "aggregate is the only global structure and is vocabulary-sized, "
    "not corpus-sized — at 100 TB prune its tail (df=1 hapaxes) before "
    "the broadcast or switch the join side to shuffle when vocab "
    "outgrows the threshold.",
)
def x_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = t.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dft"))
    stats = docs.agg(F.count("*").alias("n_docs"))
    weight = F.col("tf") * (
        (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("weight"), F.asc("term"))
    # dfreq is VOCABULARY-sized (grows with the corpus) — no broadcast
    # hint; Catalyst broadcasts it at bench SF from stats, AQE/SMJ takes
    # over when vocab outgrows the threshold (prune df=1 hapaxes first)
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", weight.alias("weight"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
    )


# ---------------------------------------------------------------------------
# data-quality profiling (one-pass per-column stats)
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _profile_oracle() -> str:
    from blspark.catalog import o_dsum

    selects = []
    for c in _PROFILE_COLS:
        selects.append(f"""
        SELECT '{c}' AS column_name,
               COUNT({c}) AS n,
               COUNT(*) - COUNT({c}) AS n_null,
               CAST(MIN({c}) AS DOUBLE) AS min_v,
               CAST(MAX({c}) AS DOUBLE) AS max_v,
               {o_dsum(c)} AS sum_v
        FROM lineitem""")
    return " UNION ALL ".join(selects)


@register(
    "x_table_profile",
    oracle=_profile_oracle(),
    doc="Data-quality profiling: per-column (count, nulls, min, max, "
    "decimal-exact sum) for the numeric lineitem columns, computed in "
    "ONE scan pass (all aggregates in a single agg, unpivoted to rows "
    "driver-side-free via stack) — the ingest-validation report every "
    "pipeline runs before training. The oracle's UNION ALL re-scans per "
    "column; Spark's plan reads the table once.",
)
def x_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.catalog import dsum

    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            (F.count("*") - F.count(c)).alias(f"{c}__n_null"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
            dsum(c).alias(f"{c}__sum"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__n_null, {c}__min, {c}__max, {c}__sum"
        for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n, n_null, min_v, max_v, sum_v)"
    )


# ---------------------------------------------------------------------------
# GPT-style stream packing: concat docs (+EOS) into fixed-size token blocks
# ---------------------------------------------------------------------------

_BLOCK = 512  # tokens per training block
_PREFIX_SHARD = 500  # docs per prefix-sum shard


@register(
    "x_concat_blocks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) + 1 AS n_eos_toks
      FROM documents
    ), c AS (
      SELECT doc_id, n_eos_toks,
             SUM(n_eos_toks) OVER (ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) - n_eos_toks
               AS offset_start
      FROM t
    )
    SELECT doc_id,
           CAST(n_eos_toks AS BIGINT) AS n_eos_toks,
           CAST(offset_start AS BIGINT) AS offset_start,
           CAST(offset_start // {_BLOCK} AS BIGINT) AS block_id
    FROM c
    """,
    doc="Pretraining stream packing: documents concatenated in doc_id "
    "order (+1 EOS token each) and cut into fixed {b}-token blocks — "
    "each doc gets its global token offset and starting block id. The "
    "oracle uses a single global-window cumsum; the Spark plan is the "
    "SCALABLE two-level prefix sum: per-shard window cumsum + tiny "
    "shard-totals running offset broadcast back — no single-partition "
    "window anywhere (same pattern as the distributed NTILE fix). "
    "Exact-integer arithmetic, bitwise-deterministic.".format(b=_BLOCK),
)
def x_concat_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_eos = (F.size(F.split("text", " ")) + 1).cast("bigint")
    t = docs.select(
        "doc_id",
        n_eos.alias("n_eos_toks"),
        (F.col("doc_id") / _PREFIX_SHARD).cast("bigint").alias("_shard"),
    )
    # level 1: cumsum within each shard (parallel windows, bounded width)
    w_shard = (
        Window.partitionBy("_shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t.withColumn(
        "_local_cum", F.sum("n_eos_toks").over(w_shard) - F.col("n_eos_toks")
    )
    # level 2: running offset of whole shards (|shards| rows — tiny)
    w_tot = (
        Window.orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    shard_offsets = (
        t.groupBy("_shard")
        .agg(F.sum("n_eos_toks").alias("_shard_toks"))
        .withColumn(
            "_shard_offset", F.sum("_shard_toks").over(w_tot) - F.col("_shard_toks")
        )
        .select("_shard", "_shard_offset")
    )
    out = local.join(F.broadcast(shard_offsets), "_shard")
    offset = F.col("_shard_offset") + F.col("_local_cum")
    return out.select(
        "doc_id",
        "n_eos_toks",
        offset.alias("offset_start"),
        F.floor(offset / _BLOCK).cast("bigint").alias("block_id"),
    )


# ---------------------------------------------------------------------------
# mixture rebalancing: per-language epoch factors (integer replication)
# ---------------------------------------------------------------------------

_EPOCHS = {"en": 1, "es": 2, "zh": 3}  # replication factor per language


@register(
    "x_mix_epochs",
    oracle=f"""
    WITH f(lang, factor) AS (VALUES
      {", ".join(f"('{lang}', {n})" for lang, n in sorted(_EPOCHS.items()))}
    )
    SELECT d.doc_id, d.lang, CAST(u.i + 1 AS INT) AS copy_idx
    FROM documents d
    JOIN f ON d.lang = f.lang
    CROSS JOIN UNNEST(range(f.factor)) u(i)
    """,
    doc="Training-mixture rebalancing by integer replication: each "
    "language gets an epoch factor (en x1 / es x2 / zh x3) and every "
    "doc is emitted factor times with a copy index — the standard "
    "'epochs per source' upsampling before stream packing. The factor "
    "table broadcasts; replication is a map-side explode(sequence), "
    "zero shuffle at any corpus size.",
)
def x_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    factors = spark.createDataFrame(
        sorted(_EPOCHS.items()), "lang string, factor int"
    )
    return (
        docs.join(F.broadcast(factors), "lang")
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.col("factor"))).alias("_c"),
        )
        .select("doc_id", "lang", F.col("_c").cast("int").alias("copy_idx"))
    )


# ---------------------------------------------------------------------------
# SCD2 dimension-history merge (slowly changing dimension, type 2)
# ---------------------------------------------------------------------------

SCD2_ORACLE = """
WITH current AS (
  SELECT c_custkey AS key, c_acctbal AS attr FROM customer
),
updates AS (
  -- deterministic update batch: every 10th key changes its balance,
  -- every 97th key is brand new
  SELECT c_custkey AS key, c_acctbal + 100.0 AS attr
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey + 1000000 AS key, 42.0 AS attr
  FROM customer WHERE c_custkey % 97 = 0
)
SELECT cur.key, cur.attr, 1 AS version,
       CASE WHEN u.key IS NULL THEN TRUE ELSE FALSE END AS is_current
FROM current cur LEFT JOIN updates u ON cur.key = u.key
UNION ALL
SELECT u.key, u.attr, 2 AS version, TRUE AS is_current
FROM updates u
"""


@register(
    "q_scd2_merge",
    oracle=SCD2_ORACLE,
    doc="Slowly-changing-dimension type-2 merge: an update batch closes "
    "the current version of changed keys (is_current=false) and appends "
    "version-2 rows; unchanged keys stay open, new keys enter at v2 — "
    "dimension history maintenance as one left join + union, the "
    "MERGE-less expression of Delta's WHEN MATCHED THEN UPDATE / WHEN "
    "NOT MATCHED THEN INSERT for history-keeping dims. Updates are "
    "dimension-sized: broadcast; the history table never rewrites "
    "untouched rows (at scale: partition history by key range and "
    "overwrite only partitions containing changed keys).",
)
def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    current = cust.select(
        F.col("c_custkey").alias("key"), F.col("c_acctbal").alias("attr")
    )
    updates = (
        cust.filter(F.col("c_custkey") % 10 == 0)
        .select(
            F.col("c_custkey").alias("key"),
            (F.col("c_acctbal") + 100.0).alias("attr"),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 97 == 0).select(
                (F.col("c_custkey") + 1000000).alias("key"),
                F.lit(42.0).alias("attr"),
            )
        )
    )
    closed = (
        current.join(
            F.broadcast(updates.select("key", F.lit(True).alias("_upd"))),
            "key",
            "left",
        )
        .select(
            "key",
            "attr",
            F.lit(1).cast("int").alias("version"),
            F.col("_upd").isNull().alias("is_current"),
        )
    )
    fresh = updates.select(
        "key",
        "attr",
        F.lit(2).cast("int").alias("version"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionByName(fresh)


# ---------------------------------------------------------------------------
# z-score anomaly detection (grouped stats broadcast back onto the stream)
# ---------------------------------------------------------------------------


def _anomaly_oracle() -> str:
    from blspark.catalog import o_davg, o_dstd

    return f"""
    WITH stats AS (
      SELECT event_type,
             {o_davg('value')} AS mean_v,
             {o_dstd('value')} AS std_v
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - s.mean_v) / s.std_v AS z
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE s.std_v <> 0
      AND ((e.value - s.mean_v) / s.std_v > 3.0
        OR (e.value - s.mean_v) / s.std_v < -3.0)
    """


@register(
    "q_zscore_anomalies",
    oracle=_anomaly_oracle(),
    doc="Z-score anomaly detection: per-event-type mean/stddev from "
    "decimal-exact sums (order-independent), broadcast back onto the "
    "fact scan, |z| > 3 rows flagged. Two passes over events, zero "
    "fact shuffle (|event_type| stats rows broadcast); the grouped-"
    "stats + map-side-probe shape that scales to any fact size. sqrt "
    "is IEEE correctly-rounded (unlike log), so z is cross-engine "
    "bitwise-deterministic.",
)
def q_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.catalog import davg, dstd

    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        davg("value").alias("mean_v"), dstd("value").alias("std_v")
    )
    # Drop degenerate constant-value groups (std = 0) identically to the
    # oracle: engines disagree on double x/0 (NULL vs ±Infinity), so the
    # guard must live on both sides, not rely on divide semantics.
    stats = stats.filter(F.col("std_v") != 0)
    z = (F.col("value") - F.col("mean_v")) / F.col("std_v")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .filter((F.col("z") > 3.0) | (F.col("z") < -3.0))
        .select("event_id", "event_type", "value", "z")
    )


# ---------------------------------------------------------------------------
# time-series resample + forward fill (gap-free hourly grid, LOCF)
# ---------------------------------------------------------------------------


def _resample_oracle() -> str:
    from blspark.catalog import o_davg

    return f"""
    WITH ev AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ), bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1 FROM ev
    ), grid AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM ev) t
      CROSS JOIN (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
                  FROM bounds) g
    ), hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             COUNT(*) AS n, {o_davg('value')} AS mean_v
      FROM ev GROUP BY 1, 2
    )
    SELECT g.event_type, g.h AS hour,
           COALESCE(hr.n, 0) AS n_events,
           LAST_VALUE(hr.mean_v IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS mean_value_ffill
    FROM grid g LEFT JOIN hourly hr
      ON hr.event_type = g.event_type AND hr.h = g.h
    """


@register(
    "x_resample_ffill",
    oracle=_resample_oracle(),
    doc="Time-series resample: a gap-free hourly grid per event_type "
    "(calendar from one tiny min/max aggregate, broadcast) left-joined "
    "to hourly aggregates; missing hours get zero counts and "
    "last-observation-carried-forward means (last(ignoreNulls) window "
    "per type). The pandas resample+ffill idiom, distributed: grid "
    "size is |types|x|hours| (metadata-scale), facts shuffle once "
    "into hourly partials, the LOCF window is keyed by type.",
)
def x_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.catalog import davg

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(hours))
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"), davg("value").alias("mean_v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.col("h").alias("hour"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.last("mean_v", ignorenulls=True).over(w).alias("mean_value_ffill"),
        )
    )


# ---------------------------------------------------------------------------
# batch padding-efficiency report (length-bucketed)
# ---------------------------------------------------------------------------


@register(
    "x_padding_efficiency",
    oracle="""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_toks FROM documents
    ), b AS (
      SELECT doc_id, n_toks,
             CASE WHEN n_toks <= 32 THEN 32
                  WHEN n_toks <= 64 THEN 64
                  WHEN n_toks <= 128 THEN 128
                  ELSE 256 END AS bucket
      FROM t
    )
    SELECT bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS sum_tokens,
           CAST(MAX(n_toks) AS BIGINT) AS max_tokens,
           CAST(COUNT(*) * MAX(n_toks) - SUM(n_toks) AS BIGINT) AS padding_waste,
           CAST((SUM(n_toks) * 10000) // (COUNT(*) * MAX(n_toks)) AS BIGINT)
             AS efficiency_bp
    FROM b GROUP BY bucket
    """,
    doc="Training-batch padding-efficiency report: docs bucketed by "
    "token length (32/64/128/256 caps), per bucket the padding waste "
    "and efficiency if batched at the bucket's observed max — the "
    "analysis that decides length-bucketed batching vs packing. "
    "Map-side bucketing + a 4-group aggregate; exact-int math only: "
    "the efficiency ratio is fixed-point basis points via integer "
    "floor-division (the catalog numeric policy forbids hashing a raw "
    "double SUM/COUNT ratio — r4 driver hash-fail was exactly that).",
)
def x_padding_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(F.split("text", " "))
    bucket = (
        F.when(n_toks <= 32, 32)
        .when(n_toks <= 64, 64)
        .when(n_toks <= 128, 128)
        .otherwise(256)
    )
    return (
        docs.select(n_toks.alias("n_toks"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("sum_tokens"),
            F.max("n_toks").cast("long").alias("max_tokens"),
            (F.count("*") * F.max("n_toks") - F.sum("n_toks")).alias(
                "padding_waste"
            ),
            F.expr(
                "(sum(n_toks) * 10000L) div (count(*) * max(n_toks))"
            ).alias("efficiency_bp"),
        )
    )


# ---------------------------------------------------------------------------
# LSH quality evaluation: candidate precision/recall vs exact ground truth
# ---------------------------------------------------------------------------


def _lsh_eval_oracle() -> str:
    from blspark.ext.dedup import SHINGLE_V_SQL
    from blspark.queries.extensions import CORPUS_SQL, SHINGLES_SQL, _MH, _band_sql

    return f"""
    WITH corpus AS ({CORPUS_SQL}),
    {SHINGLES_SQL},
    hv AS (
      SELECT id, {SHINGLE_V_SQL} AS v
      FROM (SELECT id, md5(shingle) AS h FROM sh) t
    ),
    sig AS (SELECT id, {_MH} FROM hv GROUP BY id),
    bands AS (
      SELECT id, 0 AS band_idx, {_band_sql(0)} AS band_hash FROM sig
      UNION ALL
      SELECT id, 1 AS band_idx, {_band_sql(1)} AS band_hash FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id
    ),
    sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT i.id_a, i.id_b
      FROM inter i
      JOIN sizes sa ON sa.id = i.id_a
      JOIN sizes sb ON sb.id = i.id_b
      WHERE i.n_common / (sa.n + sb.n - i.n_common) >= 0.5
    )
    SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
           (SELECT COUNT(*) FROM truth) AS n_truth,
           (SELECT COUNT(*) FROM cand c JOIN truth t
              ON c.id_a = t.id_a AND c.id_b = t.id_b) AS n_tp,
           (SELECT COUNT(*) FROM cand c JOIN truth t
              ON c.id_a = t.id_a AND c.id_b = t.id_b)
             / (SELECT COUNT(*) FROM cand) AS precision,
           (SELECT COUNT(*) FROM cand c JOIN truth t
              ON c.id_a = t.id_a AND c.id_b = t.id_b)
             / (SELECT COUNT(*) FROM truth) AS recall
    """


@register(
    "x_lsh_eval",
    oracle=_lsh_eval_oracle(),
    doc="LSH quality evaluation as a first-class query: MinHash band "
    "candidates vs the exact-Jaccard>=0.5 ground truth (inverted-index "
    "join) on the planted-duplicate corpus — candidate count, truth "
    "count, true positives, precision, recall. The metric that tunes "
    "bands/rows before a 100 TB run (the exact side is the expensive "
    "baseline you run once at sample scale; the LSH side is what "
    "ships).",
)
def x_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_sets,
    )
    from blspark.queries.extensions import _corpus

    corpus = _corpus(spark, sf_dir)
    arrs = shingle_sets(corpus, "doc_id", "text", n=3)
    sh = arrs.select("id", F.explode("shset").alias("shingle"))
    sig = minhash_signatures(sh, n_hashes=8)
    cand = lsh_candidate_pairs(sig, n_hashes=8, bands=2)
    truth = jaccard_pairs(sh, min_jaccard=0.5).select("id_a", "id_b")
    tp = cand.join(truth, ["id_a", "id_b"])
    # Stay a single lazy plan (registry convention: spark_fn builds a
    # plan, never executes): three 1-row count aggregates cross-joined
    # (broadcast NLJ over single rows). The shared shingle subtree IS
    # re-evaluated per branch (~3x the tokenize+shingle cost — the
    # branches' first exchanges differ, so ReuseExchange cannot dedupe
    # them); accepted deliberately, same recompute-over-persist stance
    # as jaccard_pairs — this is an offline tuning query run once at
    # sample scale, and a persist inside a lazy-plan builder would leak
    # past the function's lifetime.
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    n_truth = truth.agg(F.count("*").alias("n_truth"))
    n_tp = tp.agg(F.count("*").alias("n_tp"))
    return (
        n_cand.crossJoin(n_truth)
        .crossJoin(n_tp)
        .select(
            "n_candidates",
            "n_truth",
            "n_tp",
            (F.col("n_tp") / F.col("n_candidates")).alias("precision"),
            (F.col("n_tp") / F.col("n_truth")).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# two-phase exact distinct count (the skew-proof COUNT DISTINCT shape)
# ---------------------------------------------------------------------------


@register(
    "x_distinct_twophase",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT user_id, event_type FROM events
    )
    SELECT user_id, COUNT(*) AS n_types
    FROM pairs GROUP BY user_id
    """,
    doc="Exact per-key distinct count as two partial-aggregatable "
    "phases: dedupe (key, value) pairs, then count per key. Equivalent "
    "to COUNT(DISTINCT value) but every phase map-side combines, so a "
    "hot key's duplicates collapse before the shuffle — the skew-proof "
    "form of exact distinct (the lever noted in SCALE.md skew "
    "findings; Spark's expand-based COUNT DISTINCT buffers a hot key "
    "on one reducer instead).",
)
def x_distinct_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select("user_id", "event_type").distinct()
    return pairs.groupBy("user_id").agg(F.count("*").alias("n_types"))


# ---------------------------------------------------------------------------
# ordered-sequence pattern matching (MATCH_RECOGNIZE-lite)
# ---------------------------------------------------------------------------


@register(
    "x_sequence_pattern",
    oracle="""
    WITH ordered AS (
      SELECT user_id,
             string_agg(event_type, ' ' ORDER BY CAST(ts AS TIMESTAMP),
                        event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CASE WHEN regexp_matches(seq, 'click click click')
                THEN TRUE ELSE FALSE END AS matched,
           CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_events
    FROM ordered
    """,
    doc="Behavioral sequence-pattern match (MATCH_RECOGNIZE-lite): each "
    "user's event types concatenated in (ts, event_id) order, then a "
    "consecutive-run regex (three back-to-back clicks). One "
    "grouped sort per user — state is one string per user, the "
    "distributed form of per-entity pattern mining; for unbounded "
    "per-user histories window the sequence by session first.",
)
def x_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda x: x["event_type"],
        ),
        " ",
    )
    return (
        ev.groupBy("user_id")
        .agg(seq.alias("seq"), F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("seq").rlike("click click click").alias("matched"),
            "n_events",
        )
    )
