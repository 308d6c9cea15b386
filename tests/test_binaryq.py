"""Binary (1-bit) quantization properties (ext/binaryq): packing
exactness against an independent Python reimplementation, Hamming
exactness, the strict-> threshold boundary, and the structural
shortlist-rerank containment the x_binary_eval contract relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from blspark.ext.binaryq import (
    WORD_BITS,
    binary_pack,
    binary_thresholds,
    binary_topk,
    hamming,
)


def _py_pack(vec, thr, word_bits=WORD_BITS):
    """Independent packing reimplementation (pure Python, no
    Spark/DuckDB) — the third engine of the parity triangle."""
    nwords = (len(vec) + word_bits - 1) // word_bits
    words = []
    for w in range(nwords):
        acc = 0
        for j in range(word_bits):
            d = w * word_bits + j
            if d < len(vec) and vec[d] > thr[d]:
                acc |= 1 << j
        words.append(acc)
    return words


def _vecs_df(spark, rows, dim):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, vec array<double>",
    )


def test_pack_matches_independent_python(spark):
    # 40 dims -> 2 words, second one partially filled; values straddle
    # the per-dim means in varied patterns.
    dim = 40
    rows = [
        (i, [(((i + 1) * 7 + d * 13) % 11) - 5.0 for d in range(dim)])
        for i in range(6)
    ]
    df = _vecs_df(spark, rows, dim)
    thr_df = binary_thresholds(df)
    thr = thr_df.collect()[0]["thr"]
    packed = {
        r["vec_id"]: r["words"]
        for r in binary_pack(df, thr_df, dim).collect()
    }
    by_id = dict(rows)
    for vid, words in packed.items():
        assert words == _py_pack(by_id[vid], thr), vid
        assert all(0 <= w < (1 << WORD_BITS) for w in words)


def test_threshold_is_mean_and_comparison_is_strict(spark):
    # dim 0: values {0, 2} -> mean 1; a vector AT the threshold must
    # pack bit 0 as 0 (strict >), one above as 1.
    df = _vecs_df(spark, [(0, [0.0]), (1, [2.0])], 1)
    thr_df = binary_thresholds(df)
    assert thr_df.collect()[0]["thr"] == [1.0]
    probe = _vecs_df(spark, [(10, [1.0]), (11, [1.5])], 1)
    packed = {
        r["vec_id"]: r["words"]
        for r in binary_pack(probe, thr_df, 1).collect()
    }
    assert packed[10] == [0]
    assert packed[11] == [1]


def test_hamming_exact(spark):
    df = spark.createDataFrame(
        [
            ([0, 0], [0, 0], 0),
            ([0b1011, 0], [0b0001, 0], 2),
            ([(1 << 32) - 1, 0], [0, 0], 32),
            ([(1 << 32) - 1, (1 << 32) - 1], [0, 1], 63),
        ],
        "a array<long>, b array<long>, want long",
    )
    rows = df.select(hamming(F.col("a"), F.col("b")).alias("h"), "want").collect()
    for r in rows:
        assert r["h"] == r["want"]


def test_topk_rerank_contains_truth_found_by_codes(spark):
    """The structural property x_binary_eval pins: any exact-dot
    top-k pair whose neighbor reaches the Hamming shortlist survives
    the rerank (shared total order), so rerank recall >= raw-Hamming
    recall by containment."""
    import random

    rng = random.Random(13)
    dim = 32
    # 4dp-lattice values: the library's DECIMAL(28,4) threshold sums
    # are exact on these, so the independent Python mean below agrees
    # bitwise and the pack comparison cannot straddle a rounding edge.
    rows = [
        (i, [rng.randint(-10000, 10000) / 10000.0 for _ in range(dim)])
        for i in range(60)
    ]
    df = _vecs_df(spark, rows, dim)
    queries = df.filter(F.col("vec_id") < 3)
    out = binary_topk(df, queries, dim=dim, k=4, shortlist=20)
    got = {(r["query_id"], r["neighbor_id"]) for r in out.collect()}

    # Independent exact ground truth + shortlist in Python.
    by_id = dict(rows)
    thr = [
        sum(v[d] for v in by_id.values()) / len(by_id) for d in range(dim)
    ]
    packs = {i: _py_pack(v, thr) for i, v in by_id.items()}
    for qid in range(3):
        ham = sorted(
            (
                (
                    sum(
                        bin(a ^ b).count("1")
                        for a, b in zip(packs[n], packs[qid])
                    ),
                    n,
                )
                for n in by_id
                if n != qid
            ),
        )[:20]
        short = {n for _, n in ham}
        dots = sorted(
            (
                (-sum(x * y for x, y in zip(by_id[n], by_id[qid])), n)
                for n in by_id
                if n != qid
            ),
        )
        truth4 = {n for _, n in dots[:4]}
        # every truth pair the codes shortlisted must be in the output
        for n in truth4 & short:
            assert (qid, n) in got, (qid, n)
        # and the output is exactly the exact-dot top-4 of the shortlist
        rerank4 = {n for _, n in sorted(d for d in dots if d[1] in short)[:4]}
        assert {n for q, n in got if q == qid} == rerank4


def test_topk_output_shape(spark):
    rows = [(i, [float((i * 13 + d * 7) % 5 - 2) for d in range(8)]) for i in range(20)]
    df = _vecs_df(spark, rows, 8)
    queries = df.filter(F.col("vec_id") < 2)
    out = binary_topk(df, queries, dim=8, k=3, shortlist=10).collect()
    assert len(out) == 6
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
        assert 1 <= r["rank"] <= 3
        assert 0 <= r["hamming"] <= 8


def test_pack_stateless_equals_batch(spark):
    """binary_pack_stateless (inlined threshold literals — the
    streaming encode) produces words bit-identical to the batch
    binary_pack under the same thresholds."""
    from blspark.ext.binaryq import binary_pack_stateless

    dim = 40
    rows = [
        (i, [(((i + 2) * 11 + d * 7) % 13) - 6.0 for d in range(dim)])
        for i in range(8)
    ]
    df = _vecs_df(spark, rows, dim)
    thr_df = binary_thresholds(df)
    thr = list(thr_df.collect()[0]["thr"])
    batch = {
        r["vec_id"]: r["words"]
        for r in binary_pack(df, thr_df, dim).collect()
    }
    stateless = {
        r["vec_id"]: r["words"]
        for r in binary_pack_stateless(df, thr, dim).collect()
    }
    assert batch == stateless

    import pytest

    with pytest.raises(ValueError, match="thresholds length"):
        binary_pack_stateless(df, thr[:-1], dim)


def test_ivf_binary_all_cells_equals_plain(spark):
    """With nprobe = |cells| the IVF stage prunes nothing, so
    ivf_binary_topk must equal plain binary_topk row for row (the
    ivf_sq8 property-test convention at the binary rung)."""
    from blspark.ext.binaryq import ivf_binary_topk
    from blspark.ext.similarity import label_centroids

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    queries = vecs.filter(F.col("vec_id") < 3)
    cents = label_centroids(emb)
    ncells = cents.count()
    plain = binary_topk(vecs, queries, dim=64, k=4, shortlist=20)
    ivf = ivf_binary_topk(
        vecs, queries, cents, dim=64, k=4, shortlist=20, nprobe=ncells
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, ivf.collect())
    )


def test_lazy_caller_thresholds_materialized(spark):
    """ADVICE r14: a caller-supplied LAZY thresholds frame must not
    reintroduce the per-pack-call re-aggregation the None-path
    localCheckpoint prevents — ``_materialized`` defensively
    checkpoints it, while already-local frames pass through untouched,
    and results are bit-identical either way."""
    from blspark.ext.binaryq import _materialized
    from blspark.ops import local_relation

    dim = 8
    rows = [
        (i, [(((i + 2) * 5 + d * 3) % 7) - 3.0 for d in range(dim)])
        for i in range(10)
    ]
    df = _vecs_df(spark, rows, dim)
    lazy_thr = binary_thresholds(df)  # unexecuted aggregation plan
    mat = _materialized(lazy_thr)
    assert mat is not lazy_thr
    plan = mat._jdf.queryExecution().optimizedPlan().toString().lstrip()
    assert plan.startswith(("LogicalRDD", "LocalRelation")), plan
    # identity for frames that are already materialized
    loc = local_relation(binary_thresholds(df), "thr array<double>")
    assert _materialized(loc) is loc
    assert _materialized(mat) is mat
    # same topk either way
    q = _vecs_df(spark, rows[:2], dim)
    a = binary_topk(df, q, dim, k=3, shortlist=6).collect()
    b = binary_topk(df, q, dim, k=3, shortlist=6, thresholds=lazy_thr).collect()
    c = binary_topk(df, q, dim, k=3, shortlist=6, thresholds=loc).collect()
    assert a == b == c


def test_thresholds_memo_keyed_by_input_plan(spark):
    """ADVICE r14 (medium): the thresholds memo must key on WHAT was
    computed, not just (session, dataset) — a filtered/eval-sample
    frame gets its OWN entry instead of being served (or poisoning
    the cache with) full-corpus thresholds. Same contract as
    _DET_CENTROIDS_MEMO's semantic-hash keying."""
    from blspark.catalog import load_table
    from blspark.queries.extensions13 import binary_thresholds_cached
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    full = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    sample = full.filter(F.col("vec_id") % 3 == 0)

    t_full = binary_thresholds_cached(spark, SF_SMOKE, full)
    t_samp = binary_thresholds_cached(spark, SF_SMOKE, sample)
    # distinct plans -> distinct memo entries with distinct values
    assert t_full is not t_samp
    assert t_full.collect() != t_samp.collect()
    # semantically-equal plans hit the memo (identity, not rebuild)
    assert binary_thresholds_cached(spark, SF_SMOKE, full) is t_full
    assert (
        binary_thresholds_cached(
            spark, SF_SMOKE, full.filter(F.col("vec_id") % 3 == 0)
        )
        is t_samp
    )
    # and each memoized value matches a fresh computation bit-for-bit
    assert t_samp.collect() == binary_thresholds(sample).collect()
