"""Property tests for the round-5 operators (extensions8): MMR
diversification, incremental refresh == direct recompute, compaction
bin invariants, entity-resolution clustering, k-core peel semantics,
EWMA renormalization."""

from __future__ import annotations

from pyspark.sql import functions as F

from blspark.catalog import registry
from tests.conftest import SF_SMOKE

REG = registry()


# ---------------------------------------------------------------------------
# MMR
# ---------------------------------------------------------------------------


def test_mmr_rank1_is_relevance_argmax_and_scores_decay(spark):
    rows = REG["x_mmr_rerank"].spark_fn(spark, SF_SMOKE).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 3
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3, 4, 5]
        # rank 1 is pure relevance: its mmr_score equals its relevance
        assert rs[0].mmr_score == rs[0].relevance
        # later picks pay a diversity penalty: score < own relevance
        for r in rs[1:]:
            assert r.mmr_score < r.relevance
        # no repeats
        ids = [r.vec_id for r in rs]
        assert len(set(ids)) == 5
        assert qid not in ids  # query never returns itself


def test_mmr_diversifies_vs_pure_relevance(spark):
    """On at least one query the MMR selection must differ from the
    plain relevance top-5 — otherwise the diversity term is dead code
    (lambda=0.5 on 64-dim embeddings: near-certain, asserted so a
    regression to pure-relevance ranking cannot pass silently)."""
    from blspark.ext.similarity import cosine_topk
    from blspark.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    plain = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    mmr = {
        (r.query_id, r.vec_id)
        for r in REG["x_mmr_rerank"].spark_fn(spark, SF_SMOKE).collect()
    }
    assert mmr != plain


# ---------------------------------------------------------------------------
# Incremental refresh
# ---------------------------------------------------------------------------


def test_incremental_refresh_equals_direct(spark):
    from blspark.catalog import load_table

    got = {
        r.source: (r.n_docs, r.total_chars, r.min_chars, r.max_chars, r.n_new)
        for r in REG["x_incremental_agg_refresh"]
        .spark_fn(spark, SF_SMOKE)
        .collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents")
    direct = {
        r.source: (r.n_docs, r.total_chars, r.min_chars, r.max_chars)
        for r in docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .collect()
    }
    delta_counts = {
        r.source: r.n
        for r in docs.filter(F.col("doc_id") % 5 == 0)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == set(delta_counts)  # touched groups only
    for src, (nd, tc, mn, mx, n_new) in got.items():
        assert (nd, tc, mn, mx) == direct[src]
        assert n_new == delta_counts[src]


# ---------------------------------------------------------------------------
# Compaction plan
# ---------------------------------------------------------------------------


def test_compaction_bins_partition_files_contiguously(spark):
    from blspark.catalog import load_table
    from blspark.queries.extensions8 import _COMPACT_TARGET

    plan = REG["x_compaction_plan"].spark_fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents")
    totals = {
        r.source: (r.n, r.b)
        for r in docs.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("b"))
        .collect()
    }
    by_src: dict[str, list] = {}
    for r in plan:
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) == set(totals)
    for src, bins in by_src.items():
        bins.sort(key=lambda r: r.bin)
        # bins are dense 0..m and id-contiguous (no interleaving)
        assert [b.bin for b in bins] == list(range(len(bins)))
        for prev, nxt in zip(bins, bins[1:]):
            assert prev.last_file < nxt.first_file
        n_files = sum(b.n_files for b in bins)
        n_bytes = sum(b.bin_bytes for b in bins)
        assert (n_files, n_bytes) == totals[src]
        # every non-final bin closed at or past the target boundary:
        # its last file STARTS inside the bin, so cumulative bytes
        # through it reach (bin+1)*target or beyond
        cum = 0
        for b in bins[:-1]:
            cum += b.bin_bytes
            assert cum >= (b.bin + 1) * _COMPACT_TARGET


# ---------------------------------------------------------------------------
# Entity resolution
# ---------------------------------------------------------------------------


def test_entity_resolution_clusters_are_consistent(spark):
    from blspark.catalog import load_table

    rows = REG["x_entity_resolution"].spark_fn(spark, SF_SMOKE).collect()
    part_n = load_table(spark, SF_SMOKE, "part").count()
    assert len(rows) == part_n  # every record resolved exactly once
    ent_of = {}
    for r in rows:
        # same name -> same entity, deterministically
        assert ent_of.setdefault(r.p_name, r.entity) == r.entity
    entities = set(ent_of.values())
    # the entity label is the lexicographic min member name
    for name, ent in ent_of.items():
        assert ent <= name
        assert ent in ent_of and ent_of[ent] == ent
    # blocking: an entity never spans first-word blocks
    for name, ent in ent_of.items():
        assert name.split(" ")[0] == ent.split(" ")[0]
    assert 1 < len(entities) < len(ent_of) or len(entities) == len(ent_of)


def test_entity_resolution_merges_close_names_only(spark):
    from pyspark.sql import Row

    from blspark.ext.dedup import connected_components

    # synthetic: 'red bolt'~'red bell' (dist 2) merge; 'red widget' far
    names = ["red bolt", "red bell", "red widget", "blue bolt"]
    df = spark.createDataFrame([Row(p_name=n) for n in names])
    blocked = df.select("p_name", F.split("p_name", " ")[0].alias("blk"))
    a = blocked.select(F.col("p_name").alias("na"), "blk")
    b = blocked.select(
        F.col("p_name").alias("nb"), F.col("blk").alias("blk2")
    )
    pairs = (
        a.join(
            b, (F.col("blk") == F.col("blk2")) & (F.col("na") < F.col("nb"))
        )
        .filter(F.levenshtein("na", "nb") <= 3)
        .select("na", "nb")
    )
    comp = {
        r.node: r.component
        for r in connected_components(
            pairs, df, src_col="na", dst_col="nb", id_col="p_name"
        ).collect()
    }
    assert comp["red bolt"] == comp["red bell"] == "red bell"
    assert comp["red widget"] == "red widget"  # dist > 3: own entity
    assert comp["blue bolt"] == "blue bolt"  # other block untouched


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_kcore_triangle_survives_chain_peels(spark):
    from blspark.queries.extensions8 import kcore_peel

    # triangle 1-2-3 (2-core) + pendant chain 3-4-5 (peels end-first)
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    got = {
        r.node: r.core_degree for r in kcore_peel(e, k=2, rounds=4).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_pure_chain_peels_to_empty(spark):
    from blspark.queries.extensions8 import kcore_peel

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    assert kcore_peel(e, k=2, rounds=4).count() == 0


def test_kcore_budget_reaches_fixpoint_on_corpus(spark):
    """The registered query's fixed 8-round budget must land on the
    fixpoint at test scale: one extra round changes nothing."""
    from blspark.ext.dedup import jaccard_pairs, word_shingles
    from blspark.queries.extensions import _corpus
    from blspark.queries.extensions8 import (
        _KCORE_K,
        _KCORE_ROUNDS,
        kcore_peel,
    )

    corpus = _corpus(spark, SF_SMOKE)
    sh = word_shingles(corpus, "doc_id", "text", n=3)
    e = jaccard_pairs(sh, min_jaccard=0.6).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    ).localCheckpoint(eager=True)
    at_budget = sorted(
        map(tuple, kcore_peel(e, _KCORE_K, _KCORE_ROUNDS).collect())
    )
    one_more = sorted(
        map(tuple, kcore_peel(e, _KCORE_K, _KCORE_ROUNDS + 1).collect())
    )
    assert at_budget == one_more
    assert all(deg >= _KCORE_K for _, deg in at_budget)


# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------


def test_ewma_constant_series_and_first_row(spark, tmp_path):
    import shutil

    # build a tiny events-shaped parquet dir so the registered query
    # runs unmodified over controlled values
    src = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "a", 7.0, "{}"),
            (2, "2024-01-01 00:01:00", 1, "a", 7.0, "{}"),
            (3, "2024-01-01 00:02:00", 1, "a", 7.0, "{}"),
            (4, "2024-01-01 00:00:00", 1, "b", 1.0, "{}"),
            (5, "2024-01-01 00:01:00", 1, "b", 2.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path / "sf_ewma")
    src.write.mode("overwrite").parquet(f"{d}/events.parquet")
    try:
        got = {
            r.event_id: r.ewma
            for r in REG["x_ewma_smooth"].spark_fn(spark, d).collect()
        }
        # constant series: renormalized EWMA is exactly the constant
        assert got[1] == 7.0 and got[2] == 7.0 and got[3] == 7.0
        # partition-first row: no lags -> ewma == value
        assert got[4] == 1.0
        # second row: (2 + 1/2) / (1 + 1/2) = 5/3
        assert got[5] == (2.0 + 0.5) / 1.5
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Span removal
# ---------------------------------------------------------------------------


def test_span_removal_planted(spark):
    from blspark.queries.extensions8 import remove_duplicated_spans

    w = [f"w{i}" for i in range(10)]
    x = ["x0", "x1"]
    rows = [
        (1, " ".join(w)),                              # original
        (2, " ".join(x + w[:8] + ["x2"])),             # quotes w0..w7
        (3, " ".join(w)),                              # exact copy
        (4, "short doc under eight words here"),       # no grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_words, r.n_dropped, r.clean_text)
        for r in remove_duplicated_spans(df).collect()
    }
    # original keeps everything
    assert got[1] == (10, 0, " ".join(w))
    # the quoting doc loses exactly the 8 quoted positions
    assert got[2] == (11, 8, "x0 x1 x2")
    # the exact copy empties out completely
    assert got[3] == (10, 10, "")
    # sub-n docs are untouched
    assert got[4] == (6, 0, "short doc under eight words here")


def test_span_removal_corpus_invariants(spark):
    """Corpus-level invariants of the min-id canonical-occurrence rule.
    (Note: the base synthetic corpus itself contains repeated texts, so
    'originals' planted at +200000 are not necessarily first holders —
    the invariants below are the ones that actually hold.)"""
    from blspark.queries.extensions import _corpus
    from blspark.queries.extensions8 import remove_duplicated_spans

    corpus = _corpus(spark, SF_SMOKE)
    out = remove_duplicated_spans(corpus).collect()
    assert len(out) == corpus.count()  # every doc accounted for
    # planted exact copies (doc_id + 200000) always empty out: their
    # full text exists at a strictly smaller id by construction
    for r in out:
        assert 0 <= r.n_dropped <= r.n_words
        assert len(r.clean_text.split()) == (
            r.n_words - r.n_dropped if r.clean_text else 0
        )
        if r.doc_id >= 200000 and r.n_words >= 8:
            assert r.n_dropped == r.n_words and r.clean_text == ""
    # the rule keeps one canonical occurrence: not everything vanishes
    intact = [r for r in out if r.n_dropped == 0 and r.n_words >= 8]
    assert intact  # first holders survive untouched


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_countmin_overestimates_within_bound(spark):
    """CM guarantees: est >= true always (min of counters that each
    include every occurrence of the key), and merged-shard estimates
    equal direct ones exactly (counter addition is associative). Error
    bound: est - true <= total_rows * e / width holds w.h.p. — checked
    with the generous deterministic factor 4/width."""
    from blspark.catalog import load_table
    from blspark.queries.extensions8 import _CM_WIDTH

    rows = REG["x_countmin_sketch"].spark_fn(spark, SF_SMOKE).collect()
    n_total = load_table(spark, SF_SMOKE, "events").count()
    assert len(rows) == 5
    for r in rows:
        assert r.est_direct >= r.true_n
        assert r.est_merged == r.est_direct
        assert r.est_direct - r.true_n <= 4 * n_total // _CM_WIDTH


def test_mmr_small_candidate_pool(spark, tmp_path):
    """Pools smaller than K must emit min(K, pool) ranked rows instead
    of crashing or silently dropping the query (code-review r5 fix):
    4 vectors -> each query has a 3-candidate pool -> 3 rows/query."""
    import shutil

    vecs = [(i, [float(i == j) for j in range(8)], 0) for i in range(4)]
    src = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    d = str(tmp_path / "sf_mmr")
    src.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    try:
        rows = REG["x_mmr_rerank"].spark_fn(spark, d).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r.rank)
        assert set(by_q) == {0, 1, 2}
        for ranks in by_q.values():
            assert sorted(ranks) == [1, 2, 3]  # pool of 3 < K=5
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# CUSUM
# ---------------------------------------------------------------------------


def test_cusum_planted_shift(spark, tmp_path):
    """Planted mean shift: hours 0-23 at the baseline, hours 24-47
    shifted +10. The CUSUM statistic must stay ~0 before the shift and
    rise monotonically after it — the sustained-drift sensitivity the
    operator exists for — and is 0-floored everywhere."""
    import shutil

    rows = []
    eid = 0
    for hour in range(48):
        for m in range(4):  # 4 events per hour
            v = 100.0 + (10.0 if hour >= 24 else 0.0)
            rows.append(
                (eid, f"2024-01-0{1 + hour // 24}T{hour % 24:02d}:{15 * m:02d}:00",
                 1, "a", v, "{}")
            )
            eid += 1
    src = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path / "sf_cusum")
    src.write.mode("overwrite").parquet(f"{d}/events.parquet")
    try:
        out = sorted(
            REG["x_cusum_drift"].spark_fn(spark, d).collect(),
            key=lambda r: r.hour,
        )
        assert len(out) == 48
        assert all(r.cusum >= 0.0 for r in out)
        # global mean = 105; pre-shift hours drift at -5/h -> floored 0
        pre = [r.cusum for r in out[:24]]
        post = [r.cusum for r in out[24:]]
        assert max(pre) == 0.0
        # post-shift drifts +5/h: strictly increasing, ending ~120
        assert all(b > a for a, b in zip(post, post[1:]))
        assert post[-1] > 100.0
    finally:
        shutil.rmtree(d, ignore_errors=True)


# ---------------------------------------------------------------------------
# Group split / kNN label audit
# ---------------------------------------------------------------------------


def test_group_split_no_leakage_and_proportions(spark):
    from blspark.catalog import load_table

    rows = {r.split: r for r in REG["x_group_split"].spark_fn(spark, SF_SMOKE).collect()}
    assert set(rows) == {"train", "val", "test"}
    ev = load_table(spark, SF_SMOKE, "events")
    n_users = ev.select("user_id").distinct().count()
    n_events = ev.count()
    assert sum(r.n_users for r in rows.values()) == n_users
    assert sum(r.n_events for r in rows.values()) == n_events
    assert all(r.no_leakage for r in rows.values())
    # hashed 80/10/10: train holds the clear majority of users
    assert rows["train"].n_users > rows["val"].n_users
    assert rows["train"].n_users > rows["test"].n_users


def test_knn_disagreement_planted_mislabel(spark, tmp_path):
    """Planted label noise: three tight clusters of identical vectors;
    one vector carries the wrong label -> its 5 nearest neighbors all
    disagree (n_same=0, flagged); correctly labeled vectors agree."""
    import shutil

    rows = []
    vid = 0
    for label in range(3):
        base = [0.0] * 8
        base[label] = 1.0
        for _ in range(10):
            rows.append((vid, [float(x) for x in base], label))
            vid += 1
    rows[5] = (5, rows[5][1], 2)  # mislabel one cluster-0 vector
    src = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = str(tmp_path / "sf_knn")
    src.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    try:
        out = {r.vec_id: r for r in
               REG["x_label_knn_disagreement"].spark_fn(spark, d).collect()}
        assert out[5].n_same == 0 and out[5].flagged
        clean = [r for v, r in out.items() if v != 5 and v < 5]
        assert all(r.n_same >= 4 and not r.flagged for r in clean)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_histogram_quantile_within_bin_of_exact(spark, duck):
    """The within_bin contract, checked against the EXACT interpolated
    percentile: |histogram estimate - exact| <= one bin width."""
    from blspark.queries.extensions8 import _HQ_BINS

    from tests.conftest import SF_ORACLE

    rows = {
        r.p: r.est
        for r in REG["x_histogram_quantile_merge"]
        .spark_fn(spark, SF_ORACLE)
        .collect()
    }
    lo, hi = duck.execute(
        "SELECT MIN(o_totalprice), MAX(o_totalprice) FROM orders"
    ).fetchone()
    width = (hi - lo) / _HQ_BINS
    for p in (50, 95):
        exact = duck.execute(
            f"SELECT quantile_cont(o_totalprice, {p / 100}) FROM orders"
        ).fetchone()[0]
        assert abs(rows[p] - exact) <= width


# ---------------------------------------------------------------------------
# Edge cases
# ---------------------------------------------------------------------------


def test_kcore_empty_and_single_edge(spark):
    from blspark.queries.extensions8 import kcore_peel

    assert kcore_peel(_edges(spark, []), k=2, rounds=3).count() == 0
    assert kcore_peel(_edges(spark, [(1, 2)]), k=2, rounds=3).count() == 0


def test_span_removal_all_short_docs_untouched(spark):
    from blspark.queries.extensions8 import remove_duplicated_spans

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "d e")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_duplicated_spans(df).collect()}
    # identical texts but under n=8 words: no grams, nothing dropped
    assert all(r.n_dropped == 0 for r in out.values())
    assert out[1].clean_text == "a b c"


def test_ewma_null_values_propagate_consistently(spark, tmp_path):
    """A null value makes its own row's ewma null (value + ... is null)
    but coalesce(lag, 0) keeps LATER rows computable — no poisoning of
    the rest of the series."""
    import shutil

    src = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "a", 4.0, "{}"),
            (2, "2024-01-01 00:01:00", 1, "a", None, "{}"),
            (3, "2024-01-01 00:02:00", 1, "a", 8.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path / "sf_ewma_null")
    src.write.mode("overwrite").parquet(f"{d}/events.parquet")
    try:
        got = {
            r.event_id: r.ewma
            for r in REG["x_ewma_smooth"].spark_fn(spark, d).collect()
        }
        assert got[1] == 4.0
        assert got[2] is None  # own value null -> null ewma
        # row 3: the null lag contributes ZERO weight to num AND den
        # (renormalization over present values only):
        # num = 8 + 0/2 + 4/4; den = 1 + 0 + 1/4
        assert got[3] == (8.0 + 0.0 / 2 + 4.0 / 4) / (1.0 + 0.0 + 0.25)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_incremental_refresh_delta_only_group(spark, tmp_path):
    """A source present ONLY in the delta batch (its first-ever rows)
    must refresh from the delta partials alone — the coalesce branch of
    the state merge, unreachable on the stock corpus."""
    import shutil

    rows = [
        # src_a: base rows (ids not %5) + delta rows (%5)
        (1, "src_a", 10), (2, "src_a", 20), (5, "src_a", 30),
        # src_new: ONLY delta rows
        (10, "src_new", 7), (15, "src_new", 9),
    ]
    src = spark.createDataFrame(
        [(i, s, n, "x", "en") for i, s, n in rows],
        "doc_id long, source string, n_chars int, text string, lang string",
    )
    d = str(tmp_path / "sf_incr")
    src.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    try:
        got = {
            r.source: (r.n_docs, r.total_chars, r.min_chars, r.max_chars, r.n_new)
            for r in REG["x_incremental_agg_refresh"].spark_fn(spark, d).collect()
        }
        assert got["src_a"] == (3, 60, 10, 30, 1)
        assert got["src_new"] == (2, 16, 7, 9, 2)  # delta-only group
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ab_readout_consistency(spark):
    """A/A sanity on hash-split arms: both arms populated, counts sum
    to the event total, and |z| is small (the arms are a random split
    of the SAME distribution, so a huge z would mean the assignment or
    the stats are broken)."""
    from blspark.catalog import load_table

    r = REG["x_ab_readout"].spark_fn(spark, SF_SMOKE).first()
    n_total = load_table(spark, SF_SMOKE, "events").count()
    assert r.n_control + r.n_treatment == n_total
    assert r.n_control > 0 and r.n_treatment > 0
    assert abs(r.diff) == abs(r.mean_treatment - r.mean_control)
    assert abs(r.z_stat) < 5.0  # A/A: no true effect
