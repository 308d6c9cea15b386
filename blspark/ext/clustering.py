"""K-means clustering over embedding columns — the iterative-algorithm
pattern on DataFrames (Lloyd's algorithm, one shuffle per iteration).

Each iteration: broadcast the k centroids, assign every vector to its
nearest centroid (JVM-side dot products), recompute centroids by
per-dimension mean (posexplode + groupBy(cluster, pos)). Centroids are
collected to the driver between iterations — k·dim doubles, tiny by
construction — while the corpus never leaves the executors. This is
exactly how IVF cells (ext/similarity.ivf_topk) get trained."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blspark.ext.similarity import _dot, with_double_vec


def _sq_dist(v, c):
    # ||v-c||² = ||v||² - 2·v·c + ||c||²; for argmin over c with fixed v
    # the ||v||² term is constant, so comparing (||c||² - 2·v·c) suffices
    return F.aggregate(
        F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    max_iters: int = 5,
) -> tuple[DataFrame, list[float]]:
    """Returns (assignments DataFrame (id, cluster, sq_dist), inertia
    history). Deterministic: initial centroids are the first k vectors
    by id; ties in assignment break to the lowest cluster id."""
    spark = df.sparkSession
    vecs = with_double_vec(df, vec_col).select(
        F.col(id_col).alias("id"), "vec"
    ).persist()

    centroids = [
        (i, list(r["vec"]))
        for i, r in enumerate(
            vecs.orderBy("id").limit(k).collect()
        )
    ]
    inertia_history: list[float] = []

    assigned = None
    for _ in range(max_iters):
        cent_col = F.array(
            *[
                F.struct(
                    F.lit(ci).alias("cluster"),
                    F.array(*[F.lit(float(x)) for x in cvec]).alias("cvec"),
                )
                for ci, cvec in centroids
            ]
        )
        scored = vecs.select(
            "id",
            "vec",
            F.array_sort(
                F.transform(
                    cent_col,
                    lambda s: F.struct(
                        _sq_dist(F.col("vec"), s["cvec"]).alias("d"),
                        s["cluster"].alias("cluster"),
                    ),
                )
            )[0].alias("best"),
        )
        prev_assigned = assigned
        assigned = scored.select(
            "id",
            "vec",
            F.col("best.cluster").alias("cluster"),
            F.col("best.d").alias("sq_dist"),
        ).persist()
        if prev_assigned is not None:
            prev_assigned.unpersist(blocking=False)
        inertia = assigned.agg(
            F.sum(F.col("sq_dist").cast("decimal(28,10)")).cast("double")
        ).first()[0]
        inertia_history.append(float(inertia))

        new_cent = (
            assigned.select("cluster", F.posexplode("vec"))
            .groupBy("cluster", "pos")
            .agg(F.avg("col").alias("m"))
            .groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("m")))
                ).alias("pairs")
            )
            .select(
                "cluster", F.transform("pairs", lambda s: s["m"]).alias("cvec")
            )
            .collect()
        )
        centroids = sorted((r["cluster"], list(r["cvec"])) for r in new_cent)

    # Materialize the (small: id, cluster, sq_dist) result so both cached
    # inputs can be released now; the local checkpoint is reclaimed by
    # Spark's ContextCleaner once the caller drops the DataFrame.
    result = assigned.select("id", "cluster", "sq_dist").localCheckpoint(eager=True)
    assigned.unpersist(blocking=False)
    vecs.unpersist(blocking=False)
    return result, inertia_history
