"""Training-data pipeline operators, batch 2: corpus mixture reporting,
stratified sampling, benchmark decontamination, and exact-quantile
quality filtering. All are map-side or histogram-sized shuffles — the
shapes that stay cheap at 100 TB — and every one carries a DuckDB oracle
twin (MD5-based hashing and histogram-based order statistics keep each
step engine-portable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from blspark.catalog import load_table, register
from blspark.ext.dedup import SHINGLE_V_SQL
from blspark.queries.extensions import SPLIT_BUCKET_SQL

# 24-bit md5-derived int mod 16 — same portable-hash mechanism as
# SPLIT_BUCKET_SQL, narrowed to a shard count.
SHARD_BUCKET_SQL = f"({SHINGLE_V_SQL}) % 16"


@register(
    "x_corpus_mix",
    oracle="""
    WITH per AS (
      SELECT source, lang,
             COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents
      GROUP BY source, lang
    )
    SELECT source, lang, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE)
             / CAST((SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                     FROM documents) AS DOUBLE) AS token_share
    FROM per
    ORDER BY source, lang
    """,
    doc="Corpus mixture report: per (source, lang) document and token "
    "counts plus each cell's share of all tokens — the first artifact "
    "any pretraining-mix decision needs. Token counts are exact int64 "
    "sums (order-independent); the global total is a scalar broadcast. "
    "One histogram-sized shuffle (|sources|x|langs| keys); text never "
    "shuffles — tokens are counted map-side in the scan projection.",
)
def x_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "lang", F.size(F.split("text", " ")).alias("toks")
    )
    per = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("toks").alias("n_tokens"),
    )
    total = per.agg(F.sum("n_tokens").alias("grand"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "source",
            "lang",
            "n_docs",
            "n_tokens",
            (F.col("n_tokens").cast("double") / F.col("grand").cast("double")).alias(
                "token_share"
            ),
        )
        .orderBy("source", "lang")
    )


@register(
    "x_sample_stratified",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
    )
    SELECT doc_id, lang, CAST({SPLIT_BUCKET_SQL} AS INT) AS bucket
    FROM h
    WHERE {SPLIT_BUCKET_SQL} <
          CASE WHEN lang = 'en' THEN 30 ELSE 100 END
    """,
    doc="Stratified deterministic sampling: downsample the dominant "
    "language to 30% while keeping low-resource languages whole — the "
    "standard pretraining rebalance. Membership is md5(doc_id) mod 100 "
    "against a per-stratum rate, so the sample is reproducible across "
    "runs, engines, and partitionings, needs no RNG state, and is a "
    "pure map-side filter (zero shuffle at any corpus size). Extends "
    "x_sample_split's mechanism from global to per-stratum rates.",
)
def x_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "lang",
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("h"),
    )
    bucket = F.expr(SPLIT_BUCKET_SQL)
    rate = F.when(F.col("lang") == "en", F.lit(30)).otherwise(F.lit(100))
    return h.filter(bucket < rate).select(
        "doc_id", "lang", bucket.cast("int").alias("bucket")
    )


@register(
    "x_decontaminate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(w[i:i+7], ' ') AS shingle
      FROM (SELECT doc_id, w,
                   unnest(generate_series(1, len(w) - 7)) AS i
            FROM toks WHERE len(w) >= 8)
    ), probe AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0
    )
    SELECT s.doc_id, COUNT(*) AS n_shared
    FROM sh s JOIN probe p ON s.shingle = p.shingle
    WHERE s.doc_id % 50 <> 0
    GROUP BY s.doc_id
    ORDER BY n_shared DESC, doc_id
    """,
    doc="Benchmark decontamination: flag corpus documents sharing any "
    "8-word shingle with a held-out probe set (docs with id % 50 = 0 "
    "stand in for an eval benchmark), reporting how many distinct "
    "shingles leak. The probe shingle set is tiny relative to the "
    "corpus, so the join broadcasts it and the corpus never shuffles "
    "raw text — per-doc distinct shingles explode map-side (the same "
    "zip_with tokenize-once machinery as MinHash). At 100 TB this is "
    "the standard n-gram-overlap decontamination pass run before "
    "training.",
)
def x_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.dedup import word_shingles
    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", n=8)
    probe = (
        sh.filter(F.col("id") % 50 == 0)
        .select("shingle")
        .distinct()
    )
    corpus = sh.filter(F.col("id") % 50 != 0)
    return (
        corpus.join(F.broadcast(probe), "shingle")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(F.count("*").alias("n_shared"))
        .orderBy(F.desc("n_shared"), F.asc("doc_id"))
    )


@register(
    "x_quality_filter_quantile",
    oracle="""
    WITH hist AS (
      SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY n_chars
    ), cum AS (
      SELECT n_chars, SUM(c) OVER (ORDER BY n_chars) AS cum FROM hist
    ), thr AS (
      SELECT MIN(n_chars) AS t FROM cum
      WHERE cum >= CEIL(0.25 * (SELECT COUNT(*) FROM documents))
    )
    SELECT d.doc_id, d.n_chars
    FROM documents d, thr
    WHERE d.n_chars > thr.t
    """,
    doc="Quality filtering at an exact quantile: drop the bottom-25% of "
    "documents by length WITHOUT a global sort. The order statistic is "
    "computed from a value histogram — groupBy(n_chars) is a "
    "|distinct-values|-sized shuffle, the cumulative window runs over "
    "that tiny frame (not the corpus), and the resulting threshold is a "
    "1-row broadcast into a map-side filter. This is the scalable "
    "replacement for percentile-based filters: exact, deterministic, "
    "and O(distinct values) where a sort-based quantile is O(N log N) "
    "through one machine.",
)
def x_quality_filter_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hist = docs.groupBy("n_chars").agg(F.count("*").alias("c"))
    # window over the histogram (hundreds of rows), not the corpus
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("n_chars", F.sum("c").over(w).alias("cum"))
    total = docs.agg(F.count("*").alias("n"))
    thr = (
        cum.crossJoin(F.broadcast(total))
        .filter(F.col("cum") >= F.ceil(F.lit(0.25) * F.col("n")))
        .agg(F.min("n_chars").alias("t"))
    )
    return (
        docs.crossJoin(F.broadcast(thr))
        .filter(F.col("n_chars") > F.col("t"))
        .select("doc_id", "n_chars")
    )


@register(
    "x_text_repetition",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT doc_id, array_to_string(w[i:i+2], ' ') AS s
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
            FROM toks WHERE len(w) >= 3)
    )
    SELECT t.doc_id,
           CAST(len(t.w) - 2 AS BIGINT) AS n_grams,
           COUNT(DISTINCT s.s) AS n_distinct,
           1.0 - CAST(COUNT(DISTINCT s.s) AS DOUBLE)
               / CAST(len(t.w) - 2 AS DOUBLE) AS rep_ratio
    FROM toks t JOIN sh s ON t.doc_id = s.doc_id
    GROUP BY t.doc_id, len(t.w)
    ORDER BY rep_ratio DESC, t.doc_id
    """,
    doc="Intra-document repetition score (Gopher-style quality signal): "
    "fraction of repeated word 3-grams within each document — high "
    "values mark boilerplate/spam for filtering. Entirely map-side on "
    "Spark: the distinct count is size(array_distinct(shingles)) inside "
    "one projection, zero shuffle, no explode (the oracle explodes "
    "because DuckDB lambdas can't slice; semantics identical). The "
    "integer-ratio output is a raw double division (deterministic).",
)
def x_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # shingles built inline (same zip_with fold as ext.dedup.shingle_sets)
    # so total and distinct counts come from ONE tokenization in one
    # projection — no self-join back to the doc row for n_grams
    base = docs.select(F.col("doc_id"), F.split("text", " ").alias("_toks")).filter(
        F.size("_toks") >= 3
    )
    toks = F.col("_toks")
    n = 3
    # clamped at 0 like ext.dedup.shingle_sets: slice() throws on a
    # negative length if this projection ever evaluates pre-filter
    n_sh = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    shingle = F.slice(toks, 1, n_sh)
    for j in range(1, n):
        shingle = F.zip_with(
            shingle, F.slice(toks, j + 1, n_sh), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    return (
        base.select(
            "doc_id",
            n_sh.cast("bigint").alias("n_grams"),
            F.size(F.array_distinct(shingle)).cast("bigint").alias("n_distinct"),
        )
        .withColumn(
            "rep_ratio",
            F.lit(1.0)
            - F.col("n_distinct").cast("double") / F.col("n_grams").cast("double"),
        )
        .orderBy(F.desc("rep_ratio"), F.asc("doc_id"))
    )


@register(
    "x_quality_gopher_rules",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
             / len(string_split(text, ' ')) AS mean_word_len,
           CAST(len(list_filter(string_split(text, ' '),
                                t -> t IN ('the', 'a'))) AS DOUBLE)
             / len(string_split(text, ' ')) AS stop_frac,
           (len(string_split(text, ' ')) BETWEEN 20 AND 100000
            AND (CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                 / len(string_split(text, ' '))) BETWEEN 2.0 AND 10.0
            AND len(list_filter(string_split(text, ' '),
                                t -> t IN ('the', 'a'))) > 0) AS passes
    FROM documents
    ORDER BY doc_id
    """,
    doc="Gopher-style rule-based quality gate: word count bounds, mean "
    "word length band, and stopword presence, emitted per document with "
    "the composite pass flag. Pure Catalyst expressions over one scan — "
    "tokenize once, every rule folds into the same whole-stage-codegen "
    "projection, zero shuffle at any corpus size. The standard cheap "
    "pre-filter run before any model-based quality scoring.",
)
def x_quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.col("text"), F.split("text", " ").alias("_toks")
    )
    n_words = F.size("_toks").cast("bigint")
    mwl = (F.length("text") - (F.size("_toks") - 1)).cast("double") / F.size("_toks")
    n_stop = F.size(F.filter(F.col("_toks"), lambda t: t.isin("the", "a")))
    stop_frac = n_stop.cast("double") / F.size("_toks")
    passes = (
        F.size("_toks").between(20, 100000)
        & mwl.between(2.0, 10.0)
        & (n_stop > 0)
    )
    return base.select(
        "doc_id",
        n_words.alias("n_words"),
        mwl.alias("mean_word_len"),
        stop_frac.alias("stop_frac"),
        passes.alias("passes"),
    ).orderBy("doc_id")


@register(
    "x_shard_assign",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
    )
    SELECT CAST(({SHARD_BUCKET_SQL}) AS INT) AS shard,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM h
    GROUP BY 1
    ORDER BY shard
    """,
    doc="Deterministic output sharding for training-data writes: shard "
    "= md5(doc_id)-derived 24-bit int mod 16, with per-shard counts "
    "proving the balance (uniform to ~sqrt(n) at any scale). In a real "
    "write this column feeds repartition(shard)/partitionBy so every "
    "run, engine, and retry lands identical shard contents — the "
    "idempotent-recompute property the reference's sync loop needs "
    "(sync.py) applied to corpus publishing. Map-side hash + one "
    "16-key aggregate; document bodies never shuffle for the report.",
)
def x_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id", F.md5(F.col("doc_id").cast("string").cast("binary")).alias("h")
    )
    shard = F.expr(SHARD_BUCKET_SQL)
    return (
        h.groupBy(shard.cast("int").alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard")
    )


_HEX = "0123456789abcdef"


def _hexbyte(i: int) -> str:
    """DuckDB SQL for the i-th (1-based) byte of hex string column h."""
    return (
        f"((instr('{_HEX}', substring(h, {2 * i - 1}, 1))-1)*16 "
        f"+ instr('{_HEX}', substring(h, {2 * i}, 1))-1)"
    )


@register(
    "x_multimodal_decode_checked",
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS id, sha256(text) AS h,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT id, CAST(n_bytes AS BIGINT) AS n_bytes, h AS sha256,
           CAST(16 + {_hexbyte(1)} % 240 AS INT) AS width,
           CAST(16 + {_hexbyte(2)} % 240 AS INT) AS height,
           CAST(1 + {_hexbyte(3)} % 4 AS INT) AS n_channels
    FROM m
    """,
    doc="Hash-checked multimodal decode: the SAME Arrow-batched "
    "mapInPandas plumbing as x_multimodal_decode (binary content column "
    "in, per-blob features out, blobs never shuffle) with the "
    "deterministic fake decoder switched to sha256-derived pseudo-dims "
    "so a pure-SQL oracle can replay it byte-for-byte — the decode "
    "path's Python/Arrow batching is differential-tested end-to-end, "
    "not just rows-counted. Real decoders swap in via "
    "ext/multimodal.best_decoder (env-limited here).",
)
def x_multimodal_decode_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.multimodal import attach_binary, decode_features_checked

    docs = load_table(spark, sf_dir, "documents")
    return decode_features_checked(attach_binary(docs, "text", modality="image"))


@register(
    "x_multimodal_framesample",
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS id, sha256(text) AS h FROM documents
    ), d AS (
      SELECT id, CAST(1 + {_hexbyte(4)} % 4 AS INT) AS n_frames,
             CAST(1 + {_hexbyte(5)} AS INT) AS duration_s
      FROM m
    )
    SELECT id, n_frames, duration_s,
           CAST(t.k AS INT) AS frame_idx,
           CAST((t.k * duration_s * 1000) // n_frames AS BIGINT) AS t_ms
    FROM d, unnest(generate_series(0, n_frames - 1)) AS t(k)
    """,
    doc="Deterministic frame sampling over video-like blobs: pseudo "
    "frame-count/duration from the content hash, frames evenly spaced "
    "at exact integer milliseconds. One input row fans out to n_frames "
    "rows INSIDE the Arrow batch — the decode-side explode pattern "
    "(real decoders emit frame tensors here); only per-frame features "
    "leave the scan stage. Exact int arithmetic both engines.",
)
def x_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.multimodal import attach_binary, sample_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_binary(docs, "text", modality="video"))


from blspark.queries.extensions import COMPONENTS_ORACLE

APPLY_NEARDUP_ORACLE = (
    "WITH comp AS (" + COMPONENTS_ORACLE + ") "
    "SELECT component AS doc_id, COUNT(*) AS n_merged "
    "FROM comp GROUP BY component ORDER BY doc_id"
)


@register(
    "x_dedup_apply_neardup",
    oracle=APPLY_NEARDUP_ORACLE,
    doc="Near-dup dedup APPLIED: collapse each duplicate cluster "
    "(connected components over exact-Jaccard >= 0.6 pairs) to its "
    "min-id representative and report how many documents it absorbed — "
    "the surviving-corpus step that follows candidate generation and "
    "cluster resolution in a real dedup pass. One extra "
    "|docs|-keyed aggregate over the component labels; the survivors "
    "list is exactly the rows where component == doc_id.",
)
def x_dedup_apply_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.dedup import connected_components, jaccard_pairs, word_shingles
    from blspark.queries.extensions import _corpus

    corpus = _corpus(spark, sf_dir)
    sh = word_shingles(corpus, "doc_id", "text", n=3)
    pairs = jaccard_pairs(sh, min_jaccard=0.6).select("id_a", "id_b")
    nodes = corpus.select("doc_id")
    comp = connected_components(pairs, nodes, id_col="doc_id")
    return (
        comp.groupBy(F.col("component").alias("doc_id"))
        .agg(F.count("*").alias("n_merged"))
        .orderBy("doc_id")
    )


PAGERANK_ORACLE = """
WITH nodes AS (SELECT doc_id AS id FROM documents),
n_cnt AS (SELECT COUNT(*) AS n FROM nodes),
edges AS (
  SELECT id AS src, (id * id + 7) % (SELECT n FROM n_cnt) AS dst FROM nodes
  UNION ALL
  SELECT id, (id * id * 3 + 1) % (SELECT n FROM n_cnt) FROM nodes
),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
c1 AS (SELECT e.dst, SUM(r.r // g.d) AS contrib
       FROM edges e JOIN r0 r ON r.id = e.src JOIN deg g ON g.src = e.src
       GROUP BY e.dst),
r1 AS (SELECT n.id, CAST(150000 + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS r
       FROM nodes n LEFT JOIN c1 c ON c.dst = n.id),
c2 AS (SELECT e.dst, SUM(r.r // g.d) AS contrib
       FROM edges e JOIN r1 r ON r.id = e.src JOIN deg g ON g.src = e.src
       GROUP BY e.dst),
r2 AS (SELECT n.id, CAST(150000 + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS r
       FROM nodes n LEFT JOIN c2 c ON c.dst = n.id)
SELECT id, r AS rank_ppm FROM r2
"""


@register(
    "x_pagerank_iters",
    oracle=PAGERANK_ORACLE,
    doc="Iterative PageRank (2 fixed power iterations, damping 0.85) "
    "over a deterministic synthetic link graph, in EXACT integer "
    "arithmetic: ranks are parts-per-million bigints, contributions "
    "rank div degree, damping (85*x) div 100 — floor division both "
    "engines, so results hash-match with no float drift. The third "
    "iterative-algorithm family next to k-means and connected "
    "components, and the only one with a full SQL oracle (fixed "
    "iteration count unrolls to chained CTEs). Per iteration: one "
    "src-keyed join + one dst-keyed aggregate — the rank frame is "
    "(id, bigint) only, edges never change, so at 100 TB the loop "
    "re-shuffles 16 bytes/node/round while the edge partitioning is "
    "reused across rounds.",
)
def x_pagerank_iters(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id")
    )
    n_cnt = nodes.agg(F.count("*").alias("n"))
    base = nodes.crossJoin(F.broadcast(n_cnt))
    edges = (
        base.select("id", ((F.col("id") * F.col("id") + 7) % F.col("n")).alias("dst"))
        .unionByName(
            base.select(
                "id", ((F.col("id") * F.col("id") * 3 + 1) % F.col("n")).alias("dst")
            )
        )
        .select(F.col("id").alias("src"), "dst")
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    ranks = nodes.select("id", F.lit(1000000).cast("bigint").alias("r"))
    for _ in range(2):
        contrib = (
            edges.join(ranks, edges.src == ranks.id)
            .join(deg, "src")
            .select("dst", F.expr("r div d").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        ranks = nodes.join(contrib, nodes.id == contrib.dst, "left").select(
            "id",
            (
                F.lit(150000)
                + F.expr("85 * coalesce(contrib, 0L) div 100")
            ).cast("bigint").alias("r"),
        )
    return ranks.select("id", F.col("r").alias("rank_ppm"))


# quality expression shared by the weighted-sampling / budget-selection
# ops — identical to ext.text.quality_score's composite
_Q_SQL = (
    "(LEAST(len(string_split(text, ' ')) / 100.0, 1.0)"
    " + len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')))"
    " / 2.0"
)


@register(
    "x_sample_quality_weighted",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
             {_Q_SQL} AS quality
      FROM documents
    )
    SELECT doc_id, quality
    FROM s
    WHERE CAST({SHINGLE_V_SQL} AS DOUBLE) / 16777216.0 < quality
    ORDER BY doc_id
    """,
    doc="Quality-weighted deterministic sampling: each document is kept "
    "with probability equal to its composite quality score — the "
    "continuous generalization of stratified sampling that upweights "
    "clean text in a pretraining mix. The coin is md5(doc_id)'s 24-bit "
    "value scaled to [0,1): reproducible across runs/engines/"
    "partitionings, zero shuffle, pure map-side filter at any corpus "
    "size. Quality is the same deterministic double as x_text_quality.",
)
def x_sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    q = quality_score(docs, "doc_id", "text").select(
        F.col("id").alias("doc_id"), "quality"
    )
    h = q.withColumn(
        "h", F.md5(F.col("doc_id").cast("string").cast("binary"))
    )
    coin = F.expr(SHINGLE_V_SQL).cast("double") / F.lit(16777216.0)
    return (
        h.filter(coin < F.col("quality"))
        .select("doc_id", "quality")
        .orderBy("doc_id")
    )


@register(
    "x_select_token_budget",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(FLOOR({_Q_SQL} * 1000) AS INT) AS bin
      FROM documents
    ),
    binsum AS (SELECT bin, SUM(n_tokens) AS btok FROM s GROUP BY bin),
    cumbin AS (
      SELECT bin, SUM(btok) OVER (ORDER BY bin DESC) - btok AS prior
      FROM binsum
    ),
    ranked AS (
      SELECT s.doc_id, s.n_tokens, s.bin, c.prior,
             SUM(s.n_tokens) OVER (PARTITION BY s.bin ORDER BY s.doc_id)
               - s.n_tokens AS within
      FROM s JOIN cumbin c ON c.bin = s.bin
    )
    SELECT doc_id, n_tokens, bin
    FROM ranked
    WHERE prior + within < 15000
    ORDER BY bin DESC, doc_id
    """,
    doc="Data selection under a token budget: take the highest-quality "
    "documents until ~15k tokens are selected (greedy by quality bin, "
    "deterministic doc_id order inside the boundary bin). No global "
    "sort: quality discretizes to 1000 bins, the bin-level cumulative "
    "runs over a 1000-row histogram, and the only per-document window "
    "partitions BY BIN (keyed, parallel) — the same "
    "histogram-order-statistic trick as x_quality_filter_quantile "
    "extended to budgeted cumulative selection. A doc enters iff the "
    "tokens selected before it (all better bins + earlier docs in its "
    "bin) are under budget, so the output overshoots by at most one "
    "document per the greedy definition.",
)
def x_select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("bigint")
    s = docs.select(
        "doc_id",
        toks.alias("n_tokens"),
        F.floor(
            (
                F.least(F.size(F.split("text", " ")) / F.lit(100.0), F.lit(1.0))
                + F.size(F.array_distinct(F.split("text", " ")))
                / F.size(F.split("text", " "))
            )
            / F.lit(2.0)
            * 1000
        ).cast("int").alias("bin"),
    )
    binsum = s.groupBy("bin").agg(F.sum("n_tokens").alias("btok"))
    wb = Window.orderBy(F.desc("bin")).rowsBetween(Window.unboundedPreceding, 0)
    cumbin = binsum.select(
        "bin", (F.sum("btok").over(wb) - F.col("btok")).alias("prior")
    )
    wd = Window.partitionBy(F.col("s.bin")).orderBy("doc_id")
    ranked = (
        s.alias("s")
        .join(F.broadcast(cumbin).alias("c"), F.col("s.bin") == F.col("c.bin"))
        .select(
            "doc_id",
            "n_tokens",
            F.col("s.bin").alias("bin"),
            "prior",
            (F.sum("n_tokens").over(wd) - F.col("n_tokens")).alias("within"),
        )
    )
    return (
        ranked.filter(F.col("prior") + F.col("within") < 15000)
        .select("doc_id", "n_tokens", "bin")
        .orderBy(F.desc("bin"), F.asc("doc_id"))
    )


_DOTQ = "list_sum(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]))"
_NORMQ = "sqrt(list_sum(list_transform({a}, x -> x * x)))"


def _ivf_assign_sql(src: str, id_out: str, probes: int, id_filter: str = "") -> str:
    cs = _DOTQ.format(a=f"{src}.vec", b="c.cvec")
    nn = f"({_NORMQ.format(a=f'{src}.vec')} * {_NORMQ.format(a='c.cvec')})"
    return f"""
  SELECT {id_out}, vec, cell_id FROM (
    SELECT {src}.vec_id AS {id_out}, {src}.vec, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY {src}.vec_id
             ORDER BY {cs} / {nn} DESC, c.cell_id ASC) AS r
    FROM vecs {src}, cents c {id_filter}) t
  WHERE r <= {probes}
"""


IVF_CHECKED_ORACLE = f"""
WITH cm AS (
  SELECT label, t.i AS pos, ROUND(AVG(embedding[t.i + 1]::DOUBLE), 6) AS m
  FROM embeddings, range(0, 64) t(i)
  GROUP BY label, t.i
),
cents AS (
  SELECT label AS cell_id, list(m ORDER BY pos) AS cvec FROM cm GROUP BY label
),
vecs AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
cassign AS ({_ivf_assign_sql('v', 'neighbor_id', 1)}),
qassign AS ({_ivf_assign_sql('q', 'query_id', 2,
                             'WHERE q.vec_id >= 5 AND q.vec_id < 10')}),
scored AS (
  SELECT q.query_id, c.neighbor_id,
         {_DOTQ.format(a='c.vec', b='q.vec')}
           / ({_NORMQ.format(a='c.vec')} * {_NORMQ.format(a='q.vec')}) AS cos_raw
  FROM cassign c JOIN qassign q
    ON c.cell_id = q.cell_id AND c.neighbor_id <> q.query_id
)
SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
) t WHERE rank <= 3
"""


@register(
    "x_similarity_ivf_checked",
    oracle=IVF_CHECKED_ORACLE,
    doc="IVF ANN with a full SQL oracle: cells are the label groups' "
    "elementwise-mean centroids (rounded to 6 decimals so the "
    "distributed average is cross-engine deterministic — same device "
    "as x_embed_label_centroids), corpus assigned to its nearest cell, "
    "queries probe their 2 nearest cells, exact cosine top-3 inside "
    "probed cells. Identical plan shape to x_similarity_ivf (broadcast "
    "centroids, cell-bucketed equi-join — never a cross product) but "
    "with deterministic cells instead of k-means-learned ones, which "
    "upgrades the IVF family from rows-only+recall-tests to a hard "
    "hash-checked driver row.",
)
def x_similarity_ivf_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    per_pos = (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("col"), 6).alias("m"))
    )
    cents = (
        per_pos.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("centroid")
        )
        .select(F.col("label").alias("cell_id"), "centroid")
    )
    queries = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10))
    out = ivf_topk(
        emb, queries, cents, id_col="vec_id", vec_col="embedding", k=3, nprobe=2
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


_D2 = ("list_sum(list_transform(list_zip({a}, {b}), "
       "x -> (x[1] - x[2]) * (x[1] - x[2])))")


def _km_assign_sql(cents: str) -> str:
    d2 = _D2.format(a="v.vec", b="c.cvec")
    return f"""
  SELECT vec_id, vec, cell_id FROM (
    SELECT v.vec_id, v.vec, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
             ORDER BY {d2} ASC, c.cell_id ASC) AS r
    FROM vecs v, {cents} c) t
  WHERE r = 1
"""


def _km_means_sql(assigned: str) -> str:
    from blspark.catalog import o_davg

    return f"""
  SELECT cell_id, list(m ORDER BY pos) AS cvec FROM (
    SELECT a.cell_id, t.i AS pos, {o_davg("a.vec[t.i + 1]")} AS m
    FROM {assigned} a, range(0, 64) t(i)
    GROUP BY a.cell_id, t.i) s
  GROUP BY cell_id
"""


KMEANS_CHECKED_ORACLE = f"""
WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
init AS (SELECT CAST(vec_id AS INT) AS cell_id, vec AS cvec
         FROM vecs WHERE vec_id < 4),
a0 AS ({_km_assign_sql("init")}),
c1 AS ({_km_means_sql("a0")}),
a1 AS ({_km_assign_sql("c1")}),
c2 AS ({_km_means_sql("a1")}),
a2 AS ({_km_assign_sql("c2")})
SELECT vec_id, cell_id AS cluster FROM a2
"""


def _km_nearest(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Assign each vector to its squared-euclidean-nearest centroid
    (tie-break lowest cell_id). Broadcast centroids + map-side distance +
    min(struct) hash-agg argmin — vectors never shuffle on a join key, so
    the step is a single scan at any corpus size. Distances are
    deterministic cross-engine: float->double is exact, each
    subtract/multiply rounds identically, and the left-to-right aggregate
    fold matches DuckDB's list_sum order."""
    d2 = F.aggregate(
        F.zip_with(F.col("vec"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id", "vec", "cell_id", d2.alias("d2")
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.min(F.struct("d2", "cell_id")).alias("s"),
            # every row in the group carries the identical vec (it is
            # functionally dependent on vec_id), so first() is
            # deterministic in value
            F.first("vec").alias("vec"),
        )
        .select("vec_id", "vec", F.col("s.cell_id").alias("cell_id"))
    )


def _km_means(assigned: DataFrame) -> DataFrame:
    """Per-cell elementwise mean via the decimal-exact davg device —
    order-independent across any partitioning, so the recomputed
    centroids are bit-equal to the oracle's. Shuffle is keyed by
    (cell_id, pos): k*dim groups with map-side partial aggregation."""
    from blspark.catalog import davg

    per_pos = (
        assigned.select("cell_id", F.posexplode("vec"))
        .groupBy("cell_id", "pos")
        .agg(davg("col").alias("m"))
    )
    return per_pos.groupBy("cell_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("cvec")
    )


@register(
    "x_kmeans_checked",
    oracle=KMEANS_CHECKED_ORACLE,
    doc="K-means with a full SQL oracle: k=4 centroids seeded from the "
    "vectors with vec_id < 4, exactly two unrolled Lloyd iterations "
    "(assign -> decimal-exact mean -> assign -> mean -> assign), output "
    "= final cluster per vector. Same per-step plan shape as the "
    "learned-k-means x_kmeans_clusters (broadcast centroids, map-side "
    "distances, (cell,pos)-keyed mean shuffle) but with deterministic "
    "init and order-independent decimal centroid updates, which "
    "upgrades the k-means family from rows-only+property-tests to a "
    "hard hash-checked driver row.",
)
def x_kmeans_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    init = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("int").alias("cell_id"), F.col("vec").alias("cvec")
    )
    a0 = _km_nearest(vecs, init)
    c1 = _km_means(a0)
    a1 = _km_nearest(vecs, c1)
    c2 = _km_means(a1)
    a2 = _km_nearest(vecs, c2)
    return a2.select("vec_id", F.col("cell_id").alias("cluster"))


# GPT-2-style pretokenizer pattern, restricted to syntax Java regex and
# RE2 (DuckDB) interpret identically: ordered alternation, no lookarounds
# (RE2 has none), explicit ASCII classes. Contractions, space-prefixed
# word/number/punctuation runs, then residual whitespace runs.
BPE_PATTERN = "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"


@register(
    "x_text_bpe_tokens",
    oracle=f"""
    SELECT doc_id AS id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_PATTERN.replace("'", "''")}'))
                AS BIGINT) AS n_bpe_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_PATTERN.replace("'", "''")}'))
                AS DOUBLE)
             / NULLIF(CAST(len(string_split(text, ' ')) AS BIGINT), 0)
             AS bpe_per_word
    FROM documents
    """,
    doc="Regex pretokenizer token counting (the BPE front half): "
    "whitespace count vs a GPT-2-style ordered-alternation pattern "
    "(contractions | space-prefixed letter/digit/punct runs | "
    "whitespace), restricted to the Java-regex/RE2 common subset so "
    "both engines extract identical matches. Pure map-side codegen — "
    "zero shuffle at any corpus size; the ratio is the token-inflation "
    "factor budget planners use.",
)
def x_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_ws = F.size(F.split(F.col("text"), " ")).cast("bigint")
    n_bpe = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))
    ).cast("bigint")
    return docs.select(
        F.col("doc_id").alias("id"),
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        (n_bpe.cast("double") / F.nullif(n_ws, F.lit(0))).alias("bpe_per_word"),
    )


RESIZE_W, RESIZE_H = 32, 32

RESIZE_CHECKED_ORACLE = f"""
WITH m AS (
  SELECT doc_id AS id, sha256(text) AS h,
         CAST(octet_length(text::BLOB) AS BIGINT) AS src_bytes
  FROM documents
)
SELECT id, src_bytes,
       CAST(1 + {_hexbyte(3)} % 4 AS INT) AS n_channels,
       CAST({RESIZE_W} * {RESIZE_H} * (1 + {_hexbyte(3)} % 4) AS BIGINT)
         AS n_bytes
FROM m
"""


@register(
    "x_multimodal_resize_checked",
    oracle=RESIZE_CHECKED_ORACLE,
    doc="Oracle-checkable half of the resize path: per-blob channel "
    "count (sha256 pseudo-decode, same device as "
    "x_multimodal_decode_checked) and the exact resized byte budget "
    "width*height*channels. The resized bytes themselves ride in "
    "x_multimodal_resize (contract-row oracle since r5; DuckDB has no "
    "BLOB substring/digest, so raw byte content is not SQL-replayable); "
    "tests/test_ext.py pins the tile-or-truncate byte contract.",
)
def x_multimodal_resize_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.multimodal import attach_binary, fake_decode_sha256, resize_images

    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary(docs, "text", modality="image")
    resized = resize_images(
        media,
        RESIZE_W,
        RESIZE_H,
        decoder=lambda c, m: fake_decode_sha256(c)[1:4],
    )
    src = media.select("id", F.col("n_bytes").cast("bigint").alias("src_bytes"))
    return resized.select("id", "n_channels", "n_bytes").join(src, "id")


@register(
    "x_multimodal_resize",
    oracle="""
    SELECT COUNT(*) AS n_rows, TRUE AS bytes_exact,
           TRUE AS budget_ok, TRUE AS dims_fixed
    FROM documents
    """,
    doc="Arrow-batched resize over binary media columns via mapInPandas: "
    "stub pixel resample (tile-or-truncate to width*height*channels "
    "bytes — swap in PIL/cv2 where available) with real Spark plumbing; "
    "blobs stay in the scan stage and never shuffle. The sha1-derived "
    "channel counts are not SQL-replayable, so the registered form "
    "hashes a deterministic CONTRACT row: resize ran over every "
    "document, every output blob is byte-for-byte exactly its declared "
    "n_bytes == width*height*channels budget, at the fixed target dims. "
    "Raw resized blobs: ext.multimodal.resize_images + the hash-checked "
    "byte-budget twin x_multimodal_resize_checked; tile-or-truncate "
    "byte contract pinned in tests/test_ext.py.",
)
def x_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.multimodal import attach_binary, resize_images

    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary(docs, "text", modality="image")
    resized = resize_images(media, RESIZE_W, RESIZE_H)
    return resized.agg(
        F.count("*").alias("n_rows"),
        F.bool_and(F.octet_length("content") == F.col("n_bytes")).alias(
            "bytes_exact"
        ),
        F.bool_and(
            F.col("n_bytes")
            == F.col("width") * F.col("height") * F.col("n_channels")
        ).alias("budget_ok"),
        F.bool_and(
            (F.col("width") == RESIZE_W) & (F.col("height") == RESIZE_H)
        ).alias("dims_fixed"),
    )
