"""Exact weighted sampling without replacement via hash-min
replication.

The device: give item ``i`` with integer weight ``w_i`` the key

    key_i = min_{j in 1..w_i} H(id_i, j)

where ``H`` is a fixed 48-bit uniform hash (the first 12 hex nibbles
of md5, the repo's shared deterministic-hash idiom — ext/dedup
``hex_int_sql`` / ``md5_bucket``). All ``sum(w)`` draws are iid
uniforms, so the item holding the GLOBAL minimum is item ``i`` with
probability exactly ``w_i / sum(w)``; peeling winners off in key
order yields successive weighted draws without replacement (each
remaining item again wins with probability proportional to its
weight among the remainder). This is A-ES (Efraimidis–Spirakis
``u^(1/w)`` sampling) restricted to integer weights — restated as a
min over ``w`` draws so the whole computation stays in exact integer
compares: no ``pow``/``log`` (transcendental last-ulp divergence
between engines is the reason — see catalog numeric policy), no RNG
state, reproducible across runs, engines, and partitionings.

Scale shape: the key is ONE inline map-side expression per row
(``transform`` over ``sequence(1, w)`` — w is small and bounded by
contract), and top-``n`` by key plans as TakeOrderedAndProject
(per-partition partial top-n, then a single metadata-sized merge) —
no shuffle, no window, no corpus-sized sort at any data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 12 hex nibbles = 48 bits: collision odds across 10^7 draws ~ 2e-4,
# and any collision is still deterministic (consumers tie-break by id)
_KEY_NIBBLES = 12

# Contract bound on integer weights: the key expression materializes
# ``w`` md5 draws PER ROW, so an unbounded weight is an unbounded
# per-row expression — and the DuckDB oracles replicate the draw set
# with a CONSTANT ``range(1, MAX_WEIGHT + 1)`` (DuckDB range() rejects
# lateral column arguments). Both engines clamp the weight to this ONE
# constant, so a weight-formula change that exceeds it clamps
# identically on both sides instead of silently diverging. Consumers
# deriving weights (queries/extensions10.ws_keyed_frame and its
# _ws_keyed_sql oracle prefix) import this constant — never restate 8.
MAX_WEIGHT = 8


def hashmin_key(
    df: DataFrame, id_col: str, weight_col: str, overflow: str = "clamp"
) -> DataFrame:
    """Append ``skey`` = min over ``j in 1..w`` of the 48-bit integer
    prefix of ``md5(id || ':' || j)``.

    ``weight_col`` is expected to be a positive integer column; NULL
    or sub-1 weights CLAMP to 1 (one draw) rather than propagate —
    ``sequence(1, 0)`` fabricates the descending range [1, 0] (an
    item that should never win would get TWO draws), and a NULL key
    sorts NULLS FIRST in Spark but last in DuckDB, so both hazards
    would silently corrupt the sample. Weights above ``MAX_WEIGHT``
    clamp down to it — the oracles replicate the draw set with a
    constant ``range(1, MAX_WEIGHT + 1)``, so the clamp keeps both
    engines on the identical draw set (see MAX_WEIGHT); pass
    ``overflow="error"`` to fail loudly on an out-of-contract weight
    instead of silently truncating its draw set. Error mode guards
    ONLY the truncating (``> MAX_WEIGHT``) side: null, zero, and
    negative weights still clamp UP to 1 in both modes — that clamp
    is a correctness guard (two-draw / NULL-ordering hazards above),
    not a draw-set truncation. The md5 is
    taken over the UTF-8 bytes of the ``id:j`` string via
    ``dedup.md5_prefix_int`` (the one md5-prefix device), so oracles
    replicate keys exactly.
    """
    from blspark.ext.dedup import md5_prefix_int

    if overflow not in ("clamp", "error"):
        raise ValueError(f"overflow must be 'clamp' or 'error': {overflow!r}")

    w_in = F.coalesce(F.col(weight_col).cast("int"), F.lit(1))
    if overflow == "error":
        # Out-of-contract surfacing: a weight above MAX_WEIGHT would
        # silently truncate the draw set (biased sample) under the
        # default clamp; this mode fails the job loudly instead.
        w_in = F.when(
            w_in > MAX_WEIGHT,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"hashmin_key: weight exceeds MAX_WEIGHT={MAX_WEIGHT}"
                        " (would clamp and bias the draw set); id="
                    ),
                    F.col(id_col).cast("string"),
                )
            ).cast("int"),
        ).otherwise(w_in)
    w = F.least(F.lit(MAX_WEIGHT), F.greatest(F.lit(1), w_in))

    def draw(j):
        return md5_prefix_int(
            F.concat_ws(
                ":", F.col(id_col).cast("string"), j.cast("string")
            ),
            _KEY_NIBBLES,
        )

    return df.withColumn(
        "skey",
        F.array_min(F.transform(F.sequence(F.lit(1), w), draw)),
    )


def weighted_topn(
    df: DataFrame, id_col: str, weight_col: str, n: int
) -> DataFrame:
    """The ``n`` weighted-sample winners: smallest ``skey`` first,
    id tie-break. Input columns pass through with ``skey`` appended."""
    return (
        hashmin_key(df, id_col, weight_col)
        .orderBy(F.asc("skey"), F.asc(id_col))
        .limit(n)
    )


def dsir_importance(
    docs: DataFrame,
    target,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    via Importance Resampling"): score every document by how
    target-like its text is under two hashed-bigram bag-of-words
    models — the standard recipe for selecting pretraining data that
    matches a target domain (the paper's setting: raw = web crawl,
    target = curated corpus). ``target`` is a boolean Column selecting
    the target rows within ``docs`` (e.g. ``F.col("lang") == "en"``).

    The estimator, exactly: hash each space-bigram into ``n_buckets``
    buckets (md5-prefix int, the repo's one deterministic-hash idiom);
    fit Laplace-smoothed unigram-over-buckets models p (target) and q
    (all docs); each document's importance is the likelihood ratio

        imp = prod over its bigram occurrences of p_bucket / q_bucket

    computed as an ORDERED product fold over the document's bigram
    list in position order — the paper's log-sum restated as a
    product so the whole computation stays in +,*,/ on doubles (no
    log: transcendental last-ulp divergence between engines is the
    reason — the catalog numeric policy). The fold starts at 1.0
    (multiplying by 1.0 is IEEE-exact, so a leading 1.0 matches
    DuckDB's init-less list_reduce bitwise) and an empty bigram list
    (doc under 2 tokens) scores exactly 1.0.

    Scale shape: the two models are ONE aggregation pass each over
    the exploded bucket ids (map-side partial counts, |buckets| rows
    out); the dense ratio array is |buckets| doubles BROADCAST to the
    scorer, so scoring is a map-side transform+fold per document —
    no join against the corpus, no shuffle of text. At 100 TB the
    model fit is two cheap count passes and the scorer is embarrassed
    parallel. Returns ``docs``' id column plus ``imp_ratio`` (raw
    double — every op is order-pinned, so the value is bitwise
    reproducible across engines and partitionings; consumers rank or
    bucket it, see x_dsir_resample).

    DOC-LENGTH BOUND (deliberate no-log trade-off): a raw double
    product stays in finite range only while the summed log-ratio
    magnitude is under ~709 (|ln double_max|). At a typical
    per-bigram |ln(p/q)| of ~0.3 that is roughly 2,300 bigram
    occurrences, i.e. documents beyond ~2-3k tokens saturate
    ``imp_ratio`` to 0.0 or inf — still deterministic and
    oracle-matching, but the importance SIGNAL collapses and any
    downstream NTILE/rank degrades to the doc_id tie-break for those
    documents. The test corpus tops out near 100 tokens so the
    product is comfortably in range here; a real-corpus consumer
    should score a capped/chunked bigram sample per document (e.g.
    first-k or hash-sampled k bigrams, k <= ~1000 — an unbiased
    length-invariant estimator of the per-bigram mean log ratio)
    rather than the full list.
    """
    from blspark.ext.dedup import md5_bucket

    base = docs.select(
        F.col(id_col), target.alias("_is_target"),
        F.split(F.col(text_col), " ").alias("w"),
    )
    n_sh = F.greatest(F.size("w") - 1, F.lit(0))
    bgs = F.when(
        F.size("w") >= 2,
        F.zip_with(
            F.slice("w", 1, n_sh),
            F.slice("w", 2, n_sh),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bkt = base.select(
        F.col(id_col),
        "_is_target",
        F.transform(
            bgs,
            lambda bg: md5_bucket(bg, n_buckets).cast("int"),
        ).alias("bks"),
    )
    pcnt = (
        bkt.filter(F.col("_is_target"))
        .select(F.explode("bks").alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("cp"))
    )
    qcnt = (
        bkt.select(F.explode("bks").alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("cq"))
    )
    tp = pcnt.agg(F.coalesce(F.sum("cp"), F.lit(0)).alias("tp"))
    tq = qcnt.agg(F.coalesce(F.sum("cq"), F.lit(0)).alias("tq"))
    spark = docs.sparkSession
    grid = spark.range(0, n_buckets).select(F.col("id").cast("int").alias("b"))
    # Laplace-smoothed ratio per bucket, dense over 0..n_buckets-1 (a
    # bucket absent from both models still gets the constant smoothed
    # ratio); op order pinned: two int->double divisions, then one
    # double division — the oracle computes the identical sequence.
    ratio = (
        (F.coalesce(F.col("cp"), F.lit(0)) + 1).cast("double")
        / (F.col("tp") + n_buckets).cast("double")
    ) / (
        (F.coalesce(F.col("cq"), F.lit(0)) + 1).cast("double")
        / (F.col("tq") + n_buckets).cast("double")
    )
    model = (
        grid.join(pcnt, "b", "left")
        .join(qcnt, "b", "left")
        .crossJoin(tp)
        .crossJoin(tq)
        .select("b", ratio.alias("ratio"))
    )
    marr = model.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("b", "ratio"))),
            lambda s: s["ratio"],
        ).alias("_ratios")
    )
    return bkt.crossJoin(F.broadcast(marr)).select(
        F.col(id_col),
        F.aggregate(
            F.transform("bks", lambda b: F.element_at("_ratios", b + 1)),
            F.lit(1.0).cast("double"),
            lambda acc, x: acc * x,
        ).alias("imp_ratio"),
    )
