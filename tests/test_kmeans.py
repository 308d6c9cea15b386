"""K-means: monotone inertia, deterministic assignments, recoverable
planted clusters."""

from __future__ import annotations

from blspark.ext.clustering import kmeans
from tests.conftest import SF_SMOKE


def test_kmeans_inertia_non_increasing(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    assigned, history = kmeans(emb, k=4, max_iters=4)
    assert len(history) == 4
    for a, b in zip(history, history[1:]):
        assert b <= a + 1e-9, history
    n = assigned.count()
    assert n == emb.count()
    clusters = {r["cluster"] for r in assigned.select("cluster").distinct().collect()}
    assert clusters <= set(range(4))


def test_kmeans_recovers_planted_clusters(spark):
    pts = []
    for cid, center in enumerate([(0.0, 0.0), (10.0, 10.0), (-10.0, 5.0)]):
        for j in range(20):
            pts.append(
                (cid * 100 + j, [center[0] + (j % 5) * 0.1, center[1] - (j % 3) * 0.1])
            )
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    assigned, history = kmeans(df, k=3, max_iters=5)
    rows = assigned.collect()
    # all points planted around one center must share a cluster label
    by_plant: dict[int, set] = {}
    for r in rows:
        by_plant.setdefault(r["id"] // 100, set()).add(r["cluster"])
    assert all(len(s) == 1 for s in by_plant.values()), by_plant
    # and the three planted groups get three distinct labels
    assert len({next(iter(s)) for s in by_plant.values()}) == 3
    assert history[-1] < history[0]
