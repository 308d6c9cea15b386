"""Round-15 additions: Matryoshka truncated-dim ANN (mrl_topk /
mrl_prefix_ranked) and asymmetric n-gram containment dedup
(containment_pairs). Value parity vs DuckDB is the registered queries'
oracle job; these pin the STRUCTURAL claims: full-prefix degeneracy to
exact brute force, shortlist containment (the rerank >= prefix-only
recall theorem's premise), the subset-pair case Jaccard provably
misses, and the max_doc_freq scale lever."""

from __future__ import annotations

from pyspark.sql import functions as F

from blspark.ext.dedup import containment_pairs, word_shingles
from blspark.ext.similarity import cosine_topk, mrl_prefix_ranked, mrl_topk


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _fixture(spark, n=40, dim=8):
    rows = [
        (i, [(((i + 3) * 7 + d * 5) % 13) - 6.0 for d in range(dim)])
        for i in range(n)
    ]
    return _emb(spark, rows)


def test_mrl_full_prefix_equals_brute_force(spark):
    """prefix_dim == dim degenerates to exact brute force: the
    shortlist stage ranks by the true metric, so top-k survives the
    rerank unchanged — bit-identical to cosine_topk."""
    emb = _fixture(spark)
    q = emb.filter(F.col("vec_id") < 3)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in mrl_topk(emb, q, prefix_dim=8, k=5, shortlist=40).collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in cosine_topk(emb, q, k=5).collect()
    }
    assert got == want and len(want) == 15
    # and the degenerate case reports prefix_cosine == cosine
    for r in mrl_topk(emb, q, prefix_dim=8, k=5, shortlist=40).collect():
        assert r["prefix_cosine"] == r["cosine"]


def test_mrl_rerank_subset_of_shortlist_and_ge_prefix(spark):
    """The eval's structural premises: rerank top-k pairs are a subset
    of the prefix shortlist, and rerank recall >= prefix-only recall
    against exact ground truth (the argmax-5-subset theorem)."""
    emb = _fixture(spark, n=60)
    q = emb.filter(F.col("vec_id") < 4)
    ranked = mrl_prefix_ranked(emb, q, prefix_dim=3)
    short = {
        (r["query_id"], r["neighbor_id"])
        for r in ranked.filter(F.col("prank") <= 10).collect()
    }
    pref5 = {
        (r["query_id"], r["neighbor_id"])
        for r in ranked.filter(F.col("prank") <= 5).collect()
    }
    top = mrl_topk(emb, q, prefix_dim=3, k=5, shortlist=10).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in top}
    assert got <= short
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, q, k=5).collect()
    }
    assert len(got & exact) >= len(pref5 & exact)
    # ranks dense 1..k per query
    per_q = {}
    for r in top:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc quoted whole inside a much longer one: containment
    ~1 (caught at 0.9) while Jaccard is bounded by the size ratio
    (missed at 0.6) — the operator's reason to exist."""
    a_toks = [f"w{i}" for i in range(12)]
    b_toks = a_toks + [f"z{i}" for i in range(40)]
    docs = spark.createDataFrame(
        [(1, " ".join(a_toks)), (2, " ".join(b_toks))],
        "doc_id long, text string",
    )
    sh = word_shingles(docs, "doc_id", "text", n=3)
    rows = containment_pairs(sh, min_containment=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["containment"] == 1.0  # every shingle of A appears in B
    assert r["jaccard"] < 0.6  # below the Jaccard operator's threshold


def test_containment_max_doc_freq_lever(spark):
    """Stopword-shingle pruning: a shingle shared by every doc is the
    quadratic hazard; max_doc_freq drops it BEFORE the join, and pairs
    whose only overlap was the stopword shingle disappear while true
    subset pairs survive (their overlap is broad, not one shingle)."""
    common = "the quick brown"  # one shared 3-shingle across all docs
    docs = spark.createDataFrame(
        [
            (1, common + " alpha beta gamma delta"),
            (2, common + " epsilon zeta eta theta"),
            (3, common + " alpha beta gamma delta iota kappa"),
        ],
        "doc_id long, text string",
    )
    sh = word_shingles(docs, "doc_id", "text", n=3)
    unpruned = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(sh, min_containment=0.0).collect()
    }
    assert (1, 2) in unpruned  # stopword-only overlap pair exists raw
    pruned = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(
            sh, min_containment=0.0, max_doc_freq=2
        ).collect()
    }
    assert (1, 2) not in pruned  # its only shared shingle was pruned
    assert (1, 3) in pruned  # the true subset pair survives
    assert pruned[(1, 3)] > 0.5


def test_dsir_upweights_target_and_is_deterministic(spark):
    """DSIR importance: (a) target-like docs (shared bigram
    distribution) score above anti-target docs; (b) a doc with <2
    tokens scores exactly 1.0 (empty fold = init); (c) the score is
    partition-invariant (ordered fold over a broadcast model)."""
    from blspark.ext.sampling import dsir_importance

    tgt_text = "alpha beta gamma delta alpha beta"
    oth_text = "omega psi chi phi omega psi"
    rows = (
        [(i, tgt_text + f" t{i}", True) for i in range(20)]
        + [(100 + i, oth_text + f" u{i}", False) for i in range(20)]
        + [(999, "solo", False)]  # single token: no bigrams
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, is_tgt boolean"
    )
    imp = {
        r["doc_id"]: r["imp_ratio"]
        for r in dsir_importance(
            docs, F.col("is_tgt"), n_buckets=64
        ).collect()
    }
    tgt = [imp[i] for i in range(20)]
    oth = [imp[100 + i] for i in range(20)]
    assert min(tgt) > max(oth)
    assert imp[999] == 1.0
    # partition invariance: same values from a different layout
    imp2 = {
        r["doc_id"]: r["imp_ratio"]
        for r in dsir_importance(
            docs.repartition(7, "text"), F.col("is_tgt"), n_buckets=64
        ).collect()
    }
    assert imp == imp2


def test_dsir_resample_skews_toward_target(spark):
    """The resample stage pulls the sample toward the target domain
    (tile-8 docs get 8 draws vs 1) while keeping every doc eligible —
    on the real corpus the EN share of the 50-doc sample must exceed
    the EN share of the corpus."""
    from blspark.catalog import load_table, registry
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    n = docs.count()
    n_en = docs.filter(F.col("lang") == "en").count()
    sample = registry()["x_dsir_resample"].spark_fn(spark, SF_ORACLE)
    picked = sample.join(
        docs.select("doc_id", "lang"), "doc_id"
    ).collect()
    assert len(picked) == 50
    en_share_sample = sum(1 for r in picked if r["lang"] == "en") / 50
    assert en_share_sample > n_en / n
    # weights within the device contract
    assert all(1 <= r["weight"] <= 8 for r in picked)


def test_domain_balanced_quality_keeps_half_per_source(spark):
    """The balance property: per-source keep rate ~0.5 for EVERY
    source (pr >= 0.5 keeps ceil-half of each), while a GLOBAL
    median threshold on the same score spreads per-source rates —
    the crowding-out failure the per-domain normalization exists to
    prevent."""
    from blspark.catalog import load_table, registry
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    kept = registry()["x_quality_domain_balanced"].spark_fn(
        spark, SF_ORACLE
    )
    kept_by_src = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert set(kept_by_src) == set(totals)  # no source eliminated
    for s, n in totals.items():
        rate = kept_by_src[s] / n
        # pr >= 0.5 keeps the top ceil((n-1)/2)+1-ish — allow slack
        # for ties; the point is every source stays near one half
        assert 0.4 <= rate <= 0.62, (s, rate)
    # contrast: a global median threshold on the same quality score
    from blspark.ext.text import quality_score

    q = quality_score(docs, "doc_id", "text", keep=("source",))
    med = q.agg(F.expr("percentile(quality, 0.5)").alias("m")).collect()[0]["m"]
    grates = {
        r["source"]: r["k"] / totals[r["source"]]
        for r in q.filter(F.col("quality") >= med)
        .groupBy("source")
        .agg(F.count("*").alias("k"))
        .collect()
    }
    spread_global = max(grates.values()) - min(grates.values())
    brates = [kept_by_src[s] / totals[s] for s in totals]
    spread_balanced = max(brates) - min(brates)
    assert spread_balanced <= spread_global
