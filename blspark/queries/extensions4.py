"""Round-4 (late-batch) extension operators: statistical-LM corpus
scoring, hierarchical aggregate-state merge, robust (median/MAD) outlier
detection, Bloom-pruned semi-join composition, ordered string
aggregation, and lexical-diversity scoring.

Scale design notes (100 TB lens):
- LM bigram scoring: the classic two-pass statistical-LM filter shape
  (CCNet-style): pass 1 aggregates corpus bigram counts (map-side
  partial agg, shuffle keyed by |vocab-bigrams| not |docs|); pass 2
  joins the per-doc bigram stream against those counts. The counts
  table grows with corpus vocabulary, so the join is a plain shuffle
  join (NO broadcast hint) — Catalyst may still broadcast it at small
  SF from stats, and falls back to SMJ at scale. All per-doc metrics
  are exact integer aggregates (sum/count of corpus frequencies), with
  doubles produced only by one final division — deterministic across
  engines, unlike a log-prob sum (transcendental + order-dependent
  float accumulation), which is why the score is frequency-based here.
- Aggregate-state merge: the hierarchical rollup-maintenance pattern —
  shard-level partial states (count/sum/min/max) merged into the final
  aggregate WITHOUT touching base rows again. At 100 TB this is how
  per-hour shard aggregates roll into daily/site-wide totals; the
  oracle computes the direct one-level aggregation, proving
  merge(partials) == direct (the algebraic-aggregate law).
- MAD outliers: two grouped exact-percentile passes + broadcast joins
  of per-type stats (bounded by |event_type|, an enum — broadcast is
  safe by construction). Exact percentile sorts only within each
  type's group; for a mega-type, swap in approx_percentile — the
  operator contract (rows flagged by |x-med| > k*MAD) is unchanged.
- Bloom-pruned join: ext.bloom.bloom_prune in front of an exact semi
  join — the "125 MB bitset instead of tens-of-GB hash relation" prune
  for fact-by-huge-keyset filtering. False positives are removed by
  the exact join, so the composition is value-identical to the plain
  semi join (what the oracle checks).
- Ordered string agg / diversity: map-side-combinable aggregations;
  collect_set is bounded by |langs| per group (enum-sized). Diversity
  (Simpson index, type-token ratio) is exact-integer based — the
  deterministic cousin of word-entropy (whose per-word c*ln(c) sum is
  float-order-dependent and engine-varying).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blspark.catalog import load_table, o_dsum, register, dsum

# ---------------------------------------------------------------------------
# Statistical-LM corpus familiarity scoring (bigram frequencies)
# ---------------------------------------------------------------------------


def _bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, b) rows: space-joined word bigrams per document, built
    with the same zip_with/slice Catalyst fold as ext.dedup.shingle_sets
    (JVM-side, no Python)."""
    base = docs.select(
        F.col("doc_id"), F.split("text", " ").alias("w")
    ).filter(F.size("w") >= 2)
    n_sh = F.greatest(F.size("w") - 1, F.lit(0))
    bg = F.zip_with(
        F.slice("w", 1, n_sh),
        F.slice("w", 2, n_sh),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    return base.select("doc_id", F.explode(bg).alias("b"))


@register(
    "x_lm_bigram_score",
    bench=True,  # two shuffle passes keyed by |bigram vocab| — a heavy shape worth tracking
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
      SELECT doc_id, array_to_string(w[i:i+1], ' ') AS b
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
            FROM t WHERE len(w) >= 2)
    ),
    cnt AS (SELECT b, COUNT(*) AS c FROM bg GROUP BY b)
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(cnt.c) AS BIGINT) AS sum_freq,
           CAST(SUM(cnt.c) AS DOUBLE) / COUNT(*) AS avg_freq,
           CAST(SUM(CASE WHEN cnt.c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS rare_frac
    FROM bg JOIN cnt USING (b)
    GROUP BY bg.doc_id
    """,
    doc="Statistical-LM quality scoring (CCNet-style two-pass shape): "
    "pass 1 builds corpus bigram counts, pass 2 scores each document by "
    "how familiar its bigrams are to the corpus (mean corpus frequency, "
    "fraction of corpus-unique bigrams). Frequency-based rather than "
    "log-prob so every aggregate is exact-integer (deterministic across "
    "engines); a real deployment would swap the final projection for "
    "smoothed log-probs against a held-out LM. Zipf-head posture "
    "(measured, tests/test_skew.py): AQE canNOT skew-split this "
    "bg-joins-its-own-agg shape (the count side reuses its aggregation "
    "shuffle, breaking OptimizeSkewedJoin's pattern) — at 100 TB, "
    "materialize the vocab counts as a table first (re-enables "
    "skew=true splitting) or use ext.skew.salted_join; see SCALE.md "
    "round-5 skew finding.",
)
def x_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    bg = _bigrams(load_table(spark, sf_dir, "documents"))
    cnt = bg.groupBy("b").agg(F.count("*").alias("c"))
    # vocabulary-sized side: no broadcast hint (grows with corpus)
    return (
        bg.join(cnt, "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("c").alias("sum_freq"),
            (F.sum("c").cast("double") / F.count("*")).alias("avg_freq"),
            (
                F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("double")
                / F.count("*")
            ).alias("rare_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Hierarchical aggregate-state merge (rollup maintenance)
# ---------------------------------------------------------------------------


@register(
    "x_agg_state_merge",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST((SUM(n_chars) * 100) // COUNT(*) AS BIGINT) AS avg_chars_x100
    FROM documents GROUP BY source
    """,
    doc="Hierarchical partial-aggregate merge: shard-level states "
    "(count/sum/min/max per (source, shard)) merged into per-source "
    "finals without re-reading base rows — the algebraic-aggregate law "
    "that makes hour->day->month rollup maintenance possible at 100 TB. "
    "The oracle computes the DIRECT one-level aggregation, so the "
    "differential check proves merge(partials) == direct. The mean is "
    "fixed-point (x100, integer floor-div) per the catalog numeric "
    "policy — the r4 driver hash-fail was a raw double SUM/COUNT here.",
)
def x_agg_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    partial = (
        docs.withColumn("shard", F.pmod("doc_id", F.lit(8)))
        .groupBy("source", "shard")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n_chars").alias("s"),
            F.min("n_chars").alias("mn"),
            F.max("n_chars").alias("mx"),
        )
    )
    return partial.groupBy("source").agg(
        F.sum("cnt").alias("n_docs"),
        F.sum("s").alias("total_chars"),
        F.min("mn").alias("min_chars"),
        F.max("mx").alias("max_chars"),
        F.expr("(sum(s) * 100L) div sum(cnt)").alias("avg_chars_x100"),
    )


# ---------------------------------------------------------------------------
# Robust outliers: median / MAD (median absolute deviation)
# ---------------------------------------------------------------------------

_MAD_K = 5.0


@register(
    "x_mad_outliers",
    oracle=f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, med.med,
             ABS(e.value - med.med) AS adev
      FROM events e JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value, d.med, mad.mad
    FROM dev d JOIN mad USING (event_type)
    WHERE d.adev > {_MAD_K} * mad.mad
    """,
    doc="Robust anomaly detection: per-type median and MAD (median "
    "absolute deviation), flagging rows with |x - med| > k*MAD — the "
    "outlier rule that, unlike z-scores (q_zscore_anomalies), is not "
    "itself corrupted by the outliers. Exact interpolated percentiles "
    "(identical lower+(upper-lower)*frac formula in both engines); "
    "per-type stats are enum-bounded, hence broadcast back.",
)
def x_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("adev") > _MAD_K * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad")
    )


# ---------------------------------------------------------------------------
# Bloom-pruned semi join (explicit runtime-filter composition)
# ---------------------------------------------------------------------------


@register(
    "x_bloom_prune_join",
    oracle=f"""
    SELECT COUNT(*) AS n_items,
           {o_dsum('l_extendedprice')} AS total_price
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 10)
    """,
    doc="Explicit Bloom-filter join pruning (ext.bloom.bloom_prune): the "
    "fact side is pre-filtered by a ~10-bits/key bitset broadcast "
    "(viable when the key set is too big for a broadcast hash relation) "
    "then exact-semi-joined, which removes the Bloom false positives — "
    "so the composition is value-identical to the plain semi join the "
    "oracle runs. Complements Catalyst's automatic runtime bloom "
    "filters (asserted in tests/test_bloom.py).",
)
def x_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.bloom import bloom_prune

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    keys = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 10)
        .select("p_partkey")
    )
    pruned = bloom_prune(li, keys, "l_partkey", "p_partkey")
    exact = pruned.join(
        keys.withColumnRenamed("p_partkey", "l_partkey"), "l_partkey", "semi"
    )
    return exact.agg(
        F.count("*").alias("n_items"),
        dsum("l_extendedprice").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (LISTAGG shape)
# ---------------------------------------------------------------------------


@register(
    "x_listagg_sorted",
    oracle="""
    WITH d AS (SELECT DISTINCT source, lang FROM documents),
    a AS (
      SELECT source, string_agg(lang, ',' ORDER BY lang) AS langs,
             COUNT(*) AS n_langs
      FROM d GROUP BY source
    ),
    c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
    SELECT a.source, a.langs, a.n_langs, c.n_docs
    FROM a JOIN c USING (source)
    """,
    doc="Ordered string aggregation (LISTAGG/string_agg shape): the "
    "sorted distinct language roster per source. collect_set + "
    "array_sort makes the result deterministic regardless of partition "
    "order (a bare collect_list would not be); set size is bounded by "
    "the language enum, so the agg state stays tiny and map-side "
    "combinable.",
)
def x_listagg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("lang"))).alias("langs"),
        F.size(F.collect_set("lang")).cast("bigint").alias("n_langs"),
        F.count("*").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Lexical diversity (Simpson index, type-token ratio)
# ---------------------------------------------------------------------------


@register(
    "x_word_diversity",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    c AS (SELECT doc_id, tok, COUNT(*) AS c FROM w GROUP BY doc_id, tok)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           CAST(COUNT(*) AS DOUBLE) / SUM(c) AS ttr,
           1.0 - CAST(SUM(c * c) AS DOUBLE) / (SUM(c) * SUM(c))
               AS simpson
    FROM c GROUP BY doc_id
    """,
    doc="Lexical-diversity quality signals: type-token ratio and Simpson "
    "diversity index (1 - sum(c^2)/n^2) per document — the "
    "deterministic, exact-integer cousins of word entropy (whose "
    "per-word c*ln(c) float sum is accumulation-order-dependent). Low "
    "diversity marks keyword-stuffed/boilerplate docs. Shuffle keyed by "
    "(doc_id, token) with map-side combine; no joins.",
)
def x_word_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    n = F.sum("c")
    return c.groupBy("doc_id").agg(
        n.cast("bigint").alias("n_tokens"),
        F.count("*").alias("n_types"),
        (F.count("*").cast("double") / n).alias("ttr"),
        (F.lit(1.0) - F.sum(F.col("c") * F.col("c")).cast("double") / (n * n))
        .alias("simpson"),
    )


# ---------------------------------------------------------------------------
# Quality-aware dedup survivor selection (keep best, not min-id)
# ---------------------------------------------------------------------------


# the survivor-selection tail shared by every quality-aware dedup
# oracle (keep_best, the LSH pipeline): expects a CTE `j` in scope
# with (doc_id, component, quality)
SURVIVOR_TAIL_SQL = """
SELECT component, doc_id AS survivor_id, quality AS best_quality,
       CAST(n AS BIGINT) AS n_members
FROM (
  SELECT component, doc_id, quality,
         ROW_NUMBER() OVER (PARTITION BY component
                            ORDER BY quality DESC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY component) AS n
  FROM j
) WHERE rn = 1
"""


def _keep_best_oracle() -> str:
    from blspark.queries.extensions import COMPONENTS_ORACLE, CORPUS_SQL
    from blspark.queries.extensions2 import _Q_SQL

    return f"""
    WITH comp AS ({COMPONENTS_ORACLE}),
    corpus2 AS ({CORPUS_SQL}),
    q AS (SELECT doc_id, {_Q_SQL} AS quality FROM corpus2),
    j AS (
      SELECT comp.node AS doc_id, comp.component, q.quality
      FROM comp JOIN q ON q.doc_id = comp.node
    )
    {SURVIVOR_TAIL_SQL}
    """


@register(
    "x_dedup_keep_best",
    oracle=_keep_best_oracle(),
    doc="Quality-aware dedup survivor selection: each near-dup cluster "
    "(connected components over exact-Jaccard >= 0.6, same graph as "
    "x_dedup_components) keeps its HIGHEST-QUALITY member (composite "
    "length/diversity score, min-doc_id tie-break) instead of the "
    "arbitrary min-id representative — what production corpus dedup "
    "actually ships, since the canonical copy should be the cleanest "
    "one. argmax is max(struct(quality, -doc_id)): partial-aggregatable "
    "double hash-agg, no window over the full corpus.",
)
def x_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.dedup import (
        connected_components,
        jaccard_pairs,
        survivor_best,
        word_shingles,
    )
    from blspark.ext.text import quality_score
    from blspark.queries.extensions import _corpus

    corpus = _corpus(spark, sf_dir)
    sh = word_shingles(corpus, "doc_id", "text", n=3)
    pairs = jaccard_pairs(sh, min_jaccard=0.6).select("id_a", "id_b")
    comp = connected_components(
        pairs, corpus.select("doc_id"), id_col="doc_id"
    )
    q = quality_score(corpus, "doc_id", "text").select(
        F.col("id").alias("node"), "quality"
    )
    return survivor_best(comp, q)


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering key
# ---------------------------------------------------------------------------


def _zorder_oracle() -> str:
    from blspark.ext.layout import zorder_sql

    return f"""
    SELECT l_orderkey, l_linenumber,
           CAST({zorder_sql('l_partkey', 'l_suppkey', 'duck')} AS BIGINT)
               AS zkey
    FROM lineitem WHERE l_orderkey < 4000
    """


@register(
    "x_zorder_key",
    oracle=_zorder_oracle(),
    doc="Z-order (Morton) clustering key: bit-interleave of "
    "(l_partkey, l_suppkey) via ext.layout.zorder_key — sort output "
    "files by this ONE key and parquet row-group min/max stats prune "
    "range predicates on EITHER column (a plain sort clusters only its "
    "leading column). Pure codegen shift/and arithmetic, no UDF/no "
    "shuffle; the file-level skipping effect is measured in "
    "tests/test_extensions4.py over write_layout_parquet.",
)
def x_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.layout import zorder_key

    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 4000)
        .select(
            "l_orderkey",
            "l_linenumber",
            zorder_key("l_partkey", "l_suppkey").alias("zkey"),
        )
    )
