"""Round-7 extension operators: product quantization (PQ) for
embedding search at scale.

PQ is the compressed-domain counterpart of the IVF family
(ext/similarity.py): instead of pruning WHICH vectors a query scores
(IVF cells), it shrinks WHAT is scored — each 64-dim float vector
becomes n_subspaces tiny codes (32x smaller here), and queries score
corpus vectors by summing per-subspace lookup-table values (asymmetric
distance computation, ADC) without touching a raw vector. At 100 TB of
embeddings this is the difference between scanning 100 TB and scanning
~3 TB of codes; composed with IVF cells (FAISS IVF-PQ) the scan also
prunes to the probed cells. Reference scope: the reference pipeline has
no vector search at all — this family extends SURVEY.md §2's
"training-data pipeline" charter the same way the IVF/LSH operators do.

Oracle device: deterministic codebooks (seeded from the lowest-id
subvectors, ONE Lloyd refinement with decimal-exact order-independent
means — the x_kmeans_checked device per subspace), and per-pair ADC
sums folded in subspace order (DuckDB ``list_sum(list(val ORDER BY
m))`` == Spark's sorted sequential ``aggregate`` fold) — never an
unordered double SUM, per the catalog numeric policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blspark.catalog import load_table, o_davg, register

# 64-dim embeddings -> 8 subspaces x 8 dims, 4 codewords per subspace.
_PQ_M = 8
_PQ_SUBDIM = 8
_PQ_KS = 4
_PQ_K = 3

_DOTQ = "list_sum(list_transform(list_zip({a}, {b}), x -> x[1] * x[2]))"
_D2Q = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> (x[1] - x[2]) * (x[1] - x[2])))"
)


# Codebook seeding, id-ROBUST (VERDICT r7 item 3): codes are numbered
# by RANK among the n_codes lowest ids — mirroring the library's
# pq_train_codebooks (ext/similarity.py) — never by id VALUE, so
# offset/sharded id ranges (min id >= n_codes) train identically.
_PQ_SEED_SQL = f"""seeds AS MATERIALIZED (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS code
  FROM vecs ORDER BY vec_id LIMIT {_PQ_KS}
),
init AS MATERIALIZED (
  SELECT s.m, d.code, s.sv AS cw
  FROM sv s JOIN seeds d ON s.vec_id = d.vec_id
)"""


def _pq_assign_sql(cb: str, keep_sv: bool) -> str:
    d2 = _D2Q.format(a="s.sv", b="c.cw")
    sv = ", sv" if keep_sv else ""
    return f"""
  SELECT vec_id, m, code{sv} FROM (
    SELECT s.vec_id, s.m, c.code, s.sv,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
             ORDER BY {d2} ASC, c.code ASC) AS r
    FROM sv s JOIN {cb} c ON s.m = c.m) t
  WHERE r = 1
"""


# Shared CTE chains: the codes-only prefix (deterministic codebooks ->
# codes) serves the streaming-encode oracle too; _PQ_CHAIN extends it
# with the per-query LUT -> ADC scores. PQ_CHECKED ranks the scores
# directly; the re-rank query takes a longer shortlist and re-scores
# exactly.
# Training tail (seeds -> init -> one Lloyd round -> codebooks ->
# codes), agnostic to WHAT ``sv`` slices — raw vectors (the PQ chain)
# or residuals (the residual IVF-PQ oracle). One copy, so the training
# arithmetic can never diverge between the two.
_PQ_TRAIN_SQL = f"""{_PQ_SEED_SQL},
a0 AS MATERIALIZED ({_pq_assign_sql("init", keep_sv=True)}),
cb AS MATERIALIZED (
  SELECT m, code, list(c ORDER BY pos) AS cw FROM (
    SELECT a.m, a.code, t.i AS pos, {o_davg(f"a.sv[t.i + 1]")} AS c
    FROM a0 a, range(0, {_PQ_SUBDIM}) t(i)
    GROUP BY a.m, a.code, t.i) s
  GROUP BY m, code
),
codes AS MATERIALIZED ({_pq_assign_sql("cb", keep_sv=False)})"""

_PQ_CODES_CHAIN = f"""
WITH vecs AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
),
sv AS MATERIALIZED (
  SELECT vec_id, t.m,
         vec[t.m * {_PQ_SUBDIM} + 1 : t.m * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS sv
  FROM vecs, range(0, {_PQ_M}) t(m)
),
{_PQ_TRAIN_SQL}"""

_PQ_CHAIN = f"""{_PQ_CODES_CHAIN},
lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.m, c.code,
         {_DOTQ.format(a="q.sv", b="c.cw")} AS val
  FROM sv q JOIN cb c ON q.m = c.m
  WHERE q.vec_id >= 10 AND q.vec_id < 15
),
scored AS (
  SELECT l.query_id, s.vec_id AS neighbor_id,
         list_sum(list(l.val ORDER BY l.m)) AS score_raw
  FROM codes s
  JOIN lut l ON s.m = l.m AND s.code = l.code AND s.vec_id <> l.query_id
  GROUP BY l.query_id, s.vec_id
)"""

PQ_CHECKED_ORACLE = f"""{_PQ_CHAIN}
SELECT query_id, neighbor_id, ROUND(score_raw, 6) AS score, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id
      ORDER BY score_raw DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored) t
WHERE rank <= {_PQ_K}
"""

_PQ_SHORTLIST = 12

_NORMQR = "sqrt(list_sum(list_transform({a}, x -> x * x)))"

PQ_RERANK_ORACLE = f"""{_PQ_CHAIN},
shortlist AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY score_raw DESC, neighbor_id ASC) AS r
    FROM scored) t
  WHERE r <= {_PQ_SHORTLIST}
),
exact AS (
  SELECT s.query_id, s.neighbor_id,
         {{dot}} / ({{nn}} * {{nq}}) AS cos_raw
  FROM shortlist s
  JOIN vecs n ON n.vec_id = s.neighbor_id
  JOIN vecs q ON q.vec_id = s.query_id
)
SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id
      ORDER BY cos_raw DESC, neighbor_id ASC) AS INT) AS rank
  FROM exact) t
WHERE rank <= {_PQ_K}
""".format(
    dot=_DOTQ.format(a="n.vec", b="q.vec"),
    nn=_NORMQR.format(a="n.vec"),
    nq=_NORMQR.format(a="q.vec"),
)


@register(
    "x_similarity_pq_rerank",
    bench=True,
    oracle=PQ_RERANK_ORACLE,
    doc="Two-stage retrieval (shortlist-then-rerank), full SQL oracle: "
    "the PQ ADC scan produces a 12-candidate shortlist per query from "
    "compressed codes, then ONLY those candidates' raw vectors are "
    "fetched for an exact cosine re-rank to the final top-3 — the "
    "standard production ANN shape (quantization error perturbs the "
    "shortlist's internal order; the cheap exact pass fixes it). "
    "Plan shape: the Q x 12 candidate frame broadcasts; the raw-vector "
    "fetch is a broadcast-semi-join prune of one corpus scan (a "
    "point-lookup pattern on a sorted/bucketed layout at 100 TB). "
    "ext/similarity.pq_rerank_topk; tests/test_pq.py proves a "
    "corpus-sized shortlist reproduces exact cosine_topk.",
)
def x_similarity_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.similarity import (
        pq_encode,
        pq_rerank_topk,
        pq_train_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    cb = pq_train_codebooks(vecs, _PQ_M, _PQ_SUBDIM, _PQ_KS)
    codes = pq_encode(vecs, cb, _PQ_M, _PQ_SUBDIM)
    queries = vecs.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 15))
    return pq_rerank_topk(
        vecs, codes, queries, cb, _PQ_M, _PQ_SUBDIM,
        k=_PQ_K, shortlist=_PQ_SHORTLIST,
    )


_NORMQ = "sqrt(list_sum(list_transform({a}, x -> x * x)))"


def _cell_assign_sql(
    src: str,
    id_out: str,
    probes: int,
    id_filter: str = "",
    extra_expr: str = "",
    extra_name: str = "",
) -> str:
    """``extra_expr``/``extra_name``: optional extra column projected
    alongside the cell assignment (residual IVF-PQ carries
    dot(query, centroid) out of the probe step). Ranking stays by
    cosine — identical to the library's ``_cell_assign`` — regardless
    of what rides along."""
    cs = _DOTQ.format(a=f"{src}.vec", b="c.cvec")
    nn = f"({_NORMQ.format(a=f'{src}.vec')} * {_NORMQ.format(a='c.cvec')})"
    inner = f", {extra_expr} AS {extra_name}" if extra_name else ""
    outer = f", {extra_name}" if extra_name else ""
    return f"""
  SELECT {id_out}, cell_id{outer} FROM (
    SELECT {src}.vec_id AS {id_out}, c.cell_id{inner},
           ROW_NUMBER() OVER (PARTITION BY {src}.vec_id
             ORDER BY {cs} / {nn} DESC, c.cell_id ASC) AS r
    FROM vecs {src}, cents c {id_filter}) t
  WHERE r <= {probes}
"""


# Shared IVF prefix: vecs + the deterministic label-mean centroid
# device (ROUND(AVG, 6) per position — the x_similarity_ivf_checked
# convention) + the corpus cell assignment. One copy serves both the
# plain and the residual IVF-PQ oracles, so the cell geometry can
# never silently diverge between them.
_IVF_PREFIX_SQL = f"""vecs AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
),
cm AS MATERIALIZED (
  SELECT label, t.i AS pos, ROUND(AVG(embedding[t.i + 1]::DOUBLE), 6) AS m
  FROM embeddings, range(0, 64) t(i)
  GROUP BY label, t.i
),
cents AS MATERIALIZED (
  SELECT label AS cell_id, list(m ORDER BY pos) AS cvec FROM cm GROUP BY label
),
cassign AS MATERIALIZED ({_cell_assign_sql("v", "vec_id", 1)})"""

IVFPQ_CHECKED_ORACLE = f"""
WITH {_IVF_PREFIX_SQL},
qprobe AS MATERIALIZED ({_cell_assign_sql(
    "q", "query_id", 2, "WHERE q.vec_id >= 10 AND q.vec_id < 15")}),
sv AS MATERIALIZED (
  SELECT vec_id, t.m,
         vec[t.m * {_PQ_SUBDIM} + 1 : t.m * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS sv
  FROM vecs, range(0, {_PQ_M}) t(m)
),
{_PQ_TRAIN_SQL},
codesc AS MATERIALIZED (
  SELECT k.vec_id, k.m, k.code, a.cell_id
  FROM codes k JOIN cassign a ON k.vec_id = a.vec_id
),
lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.m, c.code,
         {_DOTQ.format(a="q.sv", b="c.cw")} AS val
  FROM sv q JOIN cb c ON q.m = c.m
  WHERE q.vec_id >= 10 AND q.vec_id < 15
),
scored AS (
  SELECT l.query_id, s.vec_id AS neighbor_id,
         list_sum(list(l.val ORDER BY l.m)) AS score_raw
  FROM codesc s
  JOIN qprobe p ON s.cell_id = p.cell_id
  JOIN lut l ON l.query_id = p.query_id
            AND s.m = l.m AND s.code = l.code
  WHERE s.vec_id <> p.query_id
  GROUP BY l.query_id, s.vec_id
)
SELECT query_id, neighbor_id, ROUND(score_raw, 6) AS score, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id
      ORDER BY score_raw DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored) t
WHERE rank <= {_PQ_K}
"""


def _det_centroids(emb: DataFrame) -> DataFrame:
    """Deterministic label-mean centroids (ROUND(avg, 6) per position —
    the x_similarity_ivf_checked device), MATERIALIZED as a local
    relation: |labels| rows; corpus- and query-side cell assignment
    both reference it, so the per-position aggregate (a corpus-scan
    subtree) must run once, not per branch. Shared by the plain and
    residual IVF-PQ queries — one copy of the cell geometry."""
    from blspark.ops import local_relation

    per_pos = (
        emb.select("label", F.posexplode(F.col("embedding").cast("array<double>")))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("col"), 6).alias("m"))
    )
    cents_lazy = (
        per_pos.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("centroid")
        )
        .select(F.col("label").alias("cell_id"), "centroid")
    )
    return local_relation(cents_lazy, "cell_id int, centroid array<double>")


@register(
    "x_similarity_ivfpq_checked",
    bench=True,
    oracle=IVFPQ_CHECKED_ORACLE,
    doc="FAISS-style IVF-PQ with a full SQL oracle — the 100 TB ANN "
    "configuration: IVF cells (deterministic label-mean centroids, the "
    "x_similarity_ivf_checked device) prune WHICH vectors each query "
    "scores (nprobe=2 of the label cells), while PQ codes (the "
    "x_similarity_pq_checked codebooks) shrink WHAT is scored — the "
    "ADC scan touches only the probed cells' one-byte codes, never a "
    "raw corpus vector. Plan shape: centroids + codebooks + per-query "
    "LUT + probe list all broadcast; the codes frame is the only "
    "corpus-sized input and it joins map-side; one "
    "(query, neighbor)-keyed shuffle with map-side partial sums. "
    "ext/similarity.ivfpq_topk; tests/test_pq.py proves full-probe "
    "IVF-PQ == plain ADC (the cell restriction is exact bookkeeping).",
)
def x_similarity_ivfpq_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.similarity import ivfpq_topk, pq_train_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    cents = _det_centroids(emb)
    cb = pq_train_codebooks(vecs, _PQ_M, _PQ_SUBDIM, _PQ_KS)
    queries = vecs.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 15))
    return ivfpq_topk(
        vecs, queries, cents, cb, _PQ_M, _PQ_SUBDIM, k=_PQ_K, nprobe=2
    )


@register(
    "x_similarity_pq_checked",
    bench=True,
    oracle=PQ_CHECKED_ORACLE,
    doc="Product-quantization ANN with a full SQL oracle: 64-dim "
    "embeddings split into 8x8-dim subspaces, 4 codewords per subspace "
    "trained deterministically (lowest-4-id seeds + one decimal-exact "
    "Lloyd round — the x_kmeans_checked device per subspace), corpus "
    "encoded to 8 one-byte codes per vector (32x compression), queries "
    "scored by asymmetric distance: a broadcast per-query lookup table "
    "of subspace dot products, summed in subspace order per candidate. "
    "Plan shape: codebook always broadcast; encode is one scan + "
    "(id, m)-keyed argmin; the ADC scan joins the codes frame to the "
    "broadcast LUT and partial-aggregates map-side before one "
    "(query, neighbor)-keyed shuffle. At 100 TB compose with IVF cells "
    "(keep cell_id on the codes frame, restrict the LUT join to probed "
    "cells) for FAISS-style IVF-PQ. ext/similarity.py: "
    "pq_train_codebooks / pq_encode / pq_adc_topk; "
    "tests/test_pq.py proves reconstruction beats the unrefined "
    "codebook and ADC approximates exact dot products.",
)
def x_similarity_pq_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.ext.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    cb = pq_train_codebooks(vecs, _PQ_M, _PQ_SUBDIM, _PQ_KS)
    codes = pq_encode(vecs, cb, _PQ_M, _PQ_SUBDIM)
    queries = vecs.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 15))
    return pq_adc_topk(codes, queries, cb, _PQ_M, _PQ_SUBDIM, k=_PQ_K)


# ---------------------------------------------------------------------------
# Cross-document boilerplate stripping (frequency-based, RefinedWeb-style)
# ---------------------------------------------------------------------------

_BP_W = 2  # words per segment (the "line" analog for newline-free text)
_BP_MIN_DF = 3  # absolute floor on document frequency
_BP_FRAC = 0.05  # ... and >= this fraction of the source's documents


@register(
    "x_text_boilerplate_strip",
    bench=True,
    oracle=f"""
    WITH d AS MATERIALIZED (
      SELECT doc_id, source, string_split(text, ' ') AS w
      FROM documents
    ),
    segged AS MATERIALIZED (
      SELECT doc_id, source,
             list_transform(
               range(CAST(ceil(len(w) / {_BP_W}.0) AS BIGINT)),
               s -> array_to_string(w[s * {_BP_W} + 1 : s * {_BP_W} + {_BP_W}], ' ')
             ) AS segs
      FROM d
    ),
    src_n AS MATERIALIZED (
      SELECT source, COUNT(DISTINCT doc_id) AS nd FROM d GROUP BY source
    ),
    df AS MATERIALIZED (
      SELECT u.source, u.seg
      FROM (SELECT doc_id, source, unnest(segs) AS seg FROM segged) u
      JOIN src_n n ON u.source = n.source
      GROUP BY u.source, u.seg, n.nd
      HAVING COUNT(DISTINCT u.doc_id)
             >= greatest({_BP_MIN_DF},
                         CAST(ceil({_BP_FRAC} * n.nd) AS BIGINT))
    ),
    boiler AS MATERIALIZED (
      SELECT source, list(seg) AS bl FROM df GROUP BY source
    )
    SELECT s.doc_id,
           CAST(len(s.segs) AS BIGINT) AS n_segments,
           CAST(len(list_filter(s.segs,
                x -> NOT coalesce(list_contains(b.bl, x), false)))
             AS BIGINT) AS n_kept,
           md5(coalesce(array_to_string(list_filter(s.segs,
                x -> NOT coalesce(list_contains(b.bl, x), false)), ' '), ''))
             AS cleaned_md5
    FROM segged s LEFT JOIN boiler b ON s.source = b.source
    """,
    doc="Cross-document boilerplate stripping (RefinedWeb/C4-style, "
    "frequency-based — complements x_dedup_span_removal, which keys on "
    "duplication between document PAIRS; boilerplate is detected by "
    "per-source document frequency with no pairing at all): documents "
    "split into fixed 2-word segments (the 'line' unit for "
    "newline-free text; swap in split('\\n') for real pages), a "
    "segment present in >= max(3, 5% of the source's documents) is "
    "boilerplate (the fractional threshold keeps semantics stable as "
    "sources grow — an absolute floor alone strips ~everything at "
    "10x), and every document is reassembled from its surviving "
    "segments in order. Plan shape: segmenting is pure map-side array "
    "code (one transform+slice, no explode for the rebuild); the only "
    "explode feeds the (source, segment) document-frequency aggregate; "
    "the boilerplate manifest is per-source lists that broadcast back "
    "for a map-side array filter. Two shuffles total at any corpus "
    "size. Output hashes the cleaned text via md5 so full bodies "
    "never enter the value hash. Engine gotcha pinned by the sf0.1 "
    "differential: DuckDB array_to_string([]) is NULL where Spark "
    "array_join([]) is '' — the oracle coalesces before md5.",
)
def x_text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    nseg = F.ceil(F.size(w) / F.lit(float(_BP_W))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda s: F.array_join(F.slice(w, s * _BP_W + 1, _BP_W), " "),
    )
    segged = docs.select("doc_id", "source", segs.alias("segs"))
    src_n = docs.groupBy("source").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    df = (
        segged.select(
            "doc_id", "source", F.explode("segs").alias("seg")
        )
        .groupBy("source", "seg")
        .agg(F.count_distinct("doc_id").alias("df"))
        .join(F.broadcast(src_n), "source")
        .filter(
            F.col("df")
            >= F.greatest(
                F.lit(_BP_MIN_DF),
                F.ceil(F.lit(_BP_FRAC) * F.col("nd")).cast("bigint"),
            )
        )
    )
    boiler = df.groupBy("source").agg(F.collect_list("seg").alias("bl"))
    joined = segged.join(F.broadcast(boiler), "source", "left")
    kept = F.filter(
        F.col("segs"),
        lambda x: ~F.coalesce(F.array_contains(F.col("bl"), x), F.lit(False)),
    )
    return joined.select(
        "doc_id",
        F.size("segs").cast("bigint").alias("n_segments"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.md5(F.array_join(kept, " ")).alias("cleaned_md5"),
    )
