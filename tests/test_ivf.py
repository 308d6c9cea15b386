"""IVF ANN correctness properties: probing all cells == exact brute
force; nprobe=1 returns a rank-consistent subset."""

from __future__ import annotations

from pyspark.sql import functions as F

from blspark.ext.similarity import cosine_topk, ivf_topk, label_centroids
from tests.conftest import SF_SMOKE


def _load(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    cents = label_centroids(emb).withColumn(
        "cell_id", F.col("cell_id").cast("int")
    )
    return emb, queries, cents


def test_ivf_full_probe_equals_bruteforce(spark):
    emb, queries, cents = _load(spark)
    n_cells = cents.count()
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk(emb, queries, cents, k=5, nprobe=n_cells).collect()
    }
    assert ivf == exact


def test_ivf_single_probe_subset_and_ranked(spark):
    emb, queries, cents = _load(spark)
    rows = ivf_topk(emb, queries, cents, k=5, nprobe=1).collect()
    assert len(rows) > 0
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        cos = [r["cosine"] for r in rs]
        assert cos == sorted(cos, reverse=True)  # rank-consistent
        assert len({r["neighbor_id"] for r in rs}) == len(rs)


def _recall_at_k(exact_rows, approx_rows, k=5) -> float:
    """Fraction of brute-force top-k neighbors the ANN result recovers,
    averaged over queries."""
    exact_by_q: dict[int, set] = {}
    for r in exact_rows:
        exact_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_by_q: dict[int, set] = {}
    for r in approx_rows:
        approx_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_by_q[q] & approx_by_q.get(q, set())) / len(exact_by_q[q])
        for q in exact_by_q
    ]
    return sum(recalls) / len(recalls)


def test_ivf_recall_at_k_bounds_and_monotone_in_nprobe(spark):
    """recall@5 is a first-class accuracy metric for the ANN path:
    nprobe=1 must beat a floor, and probing more cells must not lose
    recall (deterministic data + centroids -> stable assertion)."""
    emb, queries, cents = _load(spark)
    n_cells = cents.count()
    exact = cosine_topk(emb, queries, k=5).collect()
    recalls = {}
    for nprobe in (1, max(2, n_cells // 2), n_cells):
        approx = ivf_topk(emb, queries, cents, k=5, nprobe=nprobe).collect()
        recalls[nprobe] = _recall_at_k(exact, approx)
    probes = sorted(recalls)
    assert recalls[probes[0]] >= 0.05  # single-probe floor on test data
    for lo, hi in zip(probes, probes[1:]):
        assert recalls[hi] >= recalls[lo] - 1e-9  # monotone in nprobe
    assert recalls[n_cells] == 1.0  # full probe == exact (recall view)


def test_lsh_multiprobe_recall_monotone(spark):
    """Multi-probe hyperplane LSH: probing 1-bit-flip neighbor buckets
    must never lose recall vs single-bucket probing (candidate superset
    by construction), and the probe-1 result must be a subset of every
    wider probe's candidate pool."""
    from blspark.ext.similarity import hyperplane_lsh_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    hp_rows = (
        emb.filter(F.col("vec_id") < 4)
        .orderBy("vec_id")
        .select(F.col("embedding").cast("array<double>").alias("h"))
        .collect()
    )
    hyperplanes = [list(r["h"]) for r in hp_rows]
    queries = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10))
    exact = cosine_topk(emb, queries, k=3).collect()
    recalls = {}
    for probes in (1, 3, 5):
        approx = hyperplane_lsh_topk(
            emb, queries, hyperplanes, k=3, probes=probes
        ).collect()
        recalls[probes] = _recall_at_k(exact, approx, k=3)
    assert recalls[1] > 0  # single-probe floor on test data
    for lo, hi in ((1, 3), (3, 5)):
        assert recalls[hi] >= recalls[lo] - 1e-9  # monotone in probes


def test_cell_assign_agg_path_matches_brute_force(spark):
    """The probes==1 hash-aggregate argmin (min over (-sim, cell_id)
    structs — map-side combinable) must pick exactly the cell the
    rank-window rule picks: max cosine, tie-break lowest cell_id.
    Checked against a driver-side brute force over the real
    embeddings."""
    from blspark.ext.similarity import (
        _cell_assign,
        _centroid_frame,
        _norm,
        label_centroids,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    cents = label_centroids(emb).select(
        F.col("cell_id").cast("int").alias("cell_id"), "centroid"
    )
    cent = _centroid_frame(cents)
    got = {
        r["vec_id"]: r["cell_id"]
        for r in _cell_assign(
            vecs.select("vec_id", "vec", _norm(F.col("vec")).alias("vnorm")),
            cent,
            "vec_id",
            1,
        ).collect()
    }

    import math

    cmap = {r["cell_id"]: r["cvec"] for r in cent.collect()}
    for r in vecs.collect():
        v = r["vec"]
        nv = math.sqrt(sum(x * x for x in v))
        best = min(
            (
                (
                    -sum(x * y for x, y in zip(v, c))
                    / (nv * math.sqrt(sum(x * x for x in c))),
                    cid,
                )
                for cid, c in cmap.items()
            )
        )[1]
        assert got[r["vec_id"]] == best, r["vec_id"]


def test_cell_assign_zero_norm_paths_agree(spark):
    """Degenerate (zero-norm) vectors and centroids (ADVICE r8): both
    code paths must score a zero-norm pairing -inf. Before the guard,
    the probes==1 argmin ordered the NULL sim FIRST (min over
    (-sim, cell_id) structs puts NULL first), so a zero-norm CENTROID
    silently won every finite vector's cell — while the probes>1
    window (DESC, NULLS LAST) gave it to the best finite cell."""
    from blspark.ext.similarity import _cell_assign, _centroid_frame, _norm

    vecs = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),  # zero-norm vector
            (1, [1.0, 0.0]),  # aligned with cell 2's centroid
            (2, [0.0, 1.0]),  # aligned with cell 1's centroid
        ],
        "vec_id int, vec array<double>",
    ).select("vec_id", "vec", _norm(F.col("vec")).alias("vnorm"))
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 0.0])],
        "cell_id int, centroid array<double>",
    )
    cent = _centroid_frame(cents)

    # argmin path (probes=1): the zero-norm centroid (cell 0) must
    # never win a finite vector; the zero-norm vector ties everywhere
    # at -inf and falls back to the lowest cell_id
    agg = {
        r["vec_id"]: r["cell_id"]
        for r in _cell_assign(vecs, cent, "vec_id", 1).collect()
    }
    assert agg == {0: 0, 1: 2, 2: 1}

    # window path (probes=2): same ordering rule — the finite best
    # cell leads, the zero-norm centroid ranks by tie-break only
    by_id: dict[int, set[int]] = {}
    for r in _cell_assign(vecs, cent, "vec_id", 2).collect():
        by_id.setdefault(r["vec_id"], set()).add(r["cell_id"])
    assert by_id[1] == {2, 0} or by_id[1] == {2, 1}
    assert agg[1] in by_id[1] and agg[2] in by_id[2] and agg[0] in by_id[0]
    # all sims equal (-inf) for the zero-norm vector: lowest two cells
    assert by_id[0] == {0, 1}


def test_cell_assign_stateless_matches_aggregate_path(spark):
    """The per-row frozen-centroid expression (streaming index shape)
    must assign exactly the cell the batch aggregate argmin assigns —
    on the real embeddings AND on degenerate zero-norm input."""
    from blspark.ext.similarity import (
        _cell_assign,
        _centroid_frame,
        _norm,
        cell_assign_stateless,
        label_centroids,
    )

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    cents = label_centroids(emb).select(
        F.col("cell_id").cast("int").alias("cell_id"), "centroid"
    )
    agg = {
        r["vec_id"]: r["cell_id"]
        for r in _cell_assign(
            vecs.select("vec_id", "vec", _norm(F.col("vec")).alias("vnorm")),
            _centroid_frame(cents), "vec_id", 1,
        ).collect()
    }
    rows = [(r["cell_id"], list(r["centroid"])) for r in cents.collect()]
    stateless = {
        r["vec_id"]: r["cell_id"]
        for r in cell_assign_stateless(vecs, rows).collect()
    }
    assert stateless == agg

    degenerate = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0])], "vec_id int, vec array<double>"
    )
    dcents = [(0, [0.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 0.0])]
    got = {
        r["vec_id"]: r["cell_id"]
        for r in cell_assign_stateless(degenerate, dcents).collect()
    }
    # zero-norm vector -> all -inf -> lowest cell; zero-norm centroid
    # never beats a finite match (the _cell_assign guard, same rule)
    assert got == {0: 0, 1: 2}
