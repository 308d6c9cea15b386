"""Exact range search with triangle-inequality cell pruning
(ext/similarity.range_search_ivf): on separated clusters the bound
must actually PRUNE (the geometry the registered eval cannot show on
the near-isotropic testdata), and the pruned result must equal an
independent brute-force radius filter exactly."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from blspark.ext.similarity import label_centroids, range_search_ivf


def _clustered(spark, spread=0.5, n_per=12, dim=4):
    """Three well-separated clusters (centers ~14 apart, intra-cluster
    lattice offsets <= spread) — deterministic, no RNG. Centers sit
    on distinct AXES away from the origin: the family's shared cell
    assignment is cosine-based, and near-zero vectors have no
    direction (a cluster AT the origin scatters across cells and
    inflates every cover radius — exactly the degenerate geometry the
    zero-norm guards exist for)."""
    centers = [
        [10.0] + [0.0] * (dim - 1),
        [0.0, 10.0] + [0.0] * (dim - 2),
        [0.0, 0.0, 10.0] + [0.0] * (dim - 3),
    ]
    rows = []
    vid = 0
    for lab, c in enumerate(centers):
        for j in range(n_per):
            off = [
                spread * (((j * 7 + d * 3) % 5) - 2) / 2.0
                for d in range(dim)
            ]
            rows.append((vid, [c[d] + off[d] for d in range(dim)], lab))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_range_prunes_separated_clusters_and_stays_exact(spark):
    emb = _clustered(spark)
    vecs = emb.select("vec_id", F.col("embedding").alias("vec"))
    queries = vecs.filter(F.col("vec_id") < 2)  # cluster 0 members
    radius = 2.0
    result, probes = range_search_ivf(
        vecs,
        queries,
        label_centroids(emb),
        radius=radius,
        with_probe_frame=True,
    )
    got = {(r["query_id"], r["neighbor_id"]) for r in result.collect()}

    # independent brute force in Python
    pts = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    want = set()
    for q in (0, 1):
        for n, v in pts.items():
            if n == q:
                continue
            d = math.sqrt(sum((a - b) ** 2 for a, b in zip(v, pts[q])))
            if d <= radius:
                want.add((q, n))
    assert got == want and got  # exact, and non-empty

    # the triangle bound really pruned: queries sit in cluster 0,
    # clusters 1/2 are 10 away with cover radii << 8, so each query
    # probes exactly ONE of the three cells
    probe_rows = probes.collect()
    assert len(probe_rows) == 2  # 1 cell per query, not 3
    assert len({r["cell_id"] for r in probe_rows}) == 1


def test_range_self_excluded_and_radius_boundary(spark):
    """Self-matches are excluded even at distance 0, and the boundary
    is inclusive (<= radius), matching the brute-force oracle."""
    emb = _clustered(spark, spread=0.0)  # all cluster members identical
    vecs = emb.select("vec_id", F.col("embedding").alias("vec"))
    queries = vecs.filter(F.col("vec_id") == 0)
    out = range_search_ivf(
        vecs, queries, label_centroids(emb), radius=0.0
    ).collect()
    ids = {r["neighbor_id"] for r in out}
    assert 0 not in ids
    # every other cluster-0 member is at distance exactly 0 == radius
    assert ids == set(range(1, 12))
    assert all(r["dist"] == 0.0 for r in out)
