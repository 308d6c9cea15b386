"""Distributed linear algebra for the embedding column: exact-decimal
covariance and top-eigenvector power iteration — the PCA stage of an
embedding pipeline (whitening / dominant-direction removal / dim
reduction), expressed as DataFrame plans end to end.

Determinism contract (catalog numeric policy): the covariance pass
quantizes each component onto an exact POWER-OF-TWO grid —
qx = FLOOR(x * 2^40) — not a decimal cast: a double->DECIMAL(18,9)
cast rounds its 9th fractional digit differently across engines on
some inputs (observed at sf0.1: 1-step cov differences ~1e-12 that 8
power iterations amplified into a 64/64 loading mismatch), while
x * 2^40 is an EXACT double op (power-of-two multiply), FLOOR is
unambiguous, and the resulting integral double (< 2^53) casts to
DECIMAL(19,0) exactly in both engines (19, not 18: DuckDB needs
precision >= 19 to take its int128 multiply path — the dstd gotcha). Integer moments then multiply
and sum exactly (precision 37/38, inside both engines' int128
paths); the rescale back divides by 2^40 / 2^80 — power-of-two
double literals, so the division is exact — and the remaining
mean/covariance arithmetic is pinned (s_ij/n - (s_i/n)*(s_j/n), one
op order). Quantization at 2^-40 (~9e-13) is far below float32 input
precision, so the matrix is the true covariance to ~1e-12.
The power iteration is pure +,*,/ and SQRT (the one correctly-rounded
transcendental) over ordered folds — matvec folds j in index order
from 0.0, the norm folds squares in index order — so after any fixed
number of iterations the vector is BITWISE identical across engines
and partitionings. No convergence test (a float comparison would be a
hidden determinism hazard): iteration count is fixed, the Rayleigh
quotient prices how converged the result is.

Scale shape (100 TB): the covariance pass explodes each vector into
its d(d+1)/2 ordered component pairs and partially aggregates
map-side — the shuffle carries d(d+1)/2 groups total (d = 64 ->
2,080), independent of corpus size; the d x d matrix is metadata
(32 KB) and the iteration runs on a ONE-ROW frame (localCheckpoint
per step truncates the expression tree — the pagerank/components
lineage device). For top-k components, deflate and repeat, or block
iteration; the matrix stays broadcast-sized for any d where d^2
doubles fit an executor (d <= ~30k)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^40 / 2^80 as exact double literals: power-of-two scaling factors,
# so multiplying/dividing by them never rounds.
_Q_SCALE = float(2**40)
_Q_SCALE2 = float(2**80)


def covariance_matrix(
    emb: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """ONE row: n (long), trace (double), cov (array<array<double>>,
    dim x dim, sample covariance with 1/n normalization). Exact
    integer moments on the 2^-40 grid; pinned double arithmetic
    (module doc)."""
    comp = emb.select(
        "vec_id",
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"),
    ).select(
        "vec_id",
        "i",
        F.floor(F.col("x") * F.lit(_Q_SCALE))
        .cast("decimal(19,0)")
        .alias("qx"),
    )
    b = comp.select(
        F.col("vec_id").alias("vid2"),
        F.col("i").alias("j"),
        F.col("qx").alias("qy"),
    )
    mom = (
        comp.join(
            b,
            (F.col("vec_id") == F.col("vid2")) & (F.col("i") <= F.col("j")),
        )
        .groupBy("i", "j")
        .agg(F.sum(F.col("qx") * F.col("qy")).cast("double").alias("s"))
    )
    sums = comp.groupBy("i").agg(
        F.sum("qx").cast("double").alias("s1")
    )
    n = emb.agg(F.count("*").alias("n"))
    si = sums.select(F.col("i").alias("_i"), F.col("s1").alias("si"))
    sj = sums.select(F.col("i").alias("_j"), F.col("s1").alias("sj"))
    cov_ij = (
        (F.col("s") / F.col("n")) / F.lit(_Q_SCALE2)
        - ((F.col("si") / F.col("n")) / F.lit(_Q_SCALE))
        * ((F.col("sj") / F.col("n")) / F.lit(_Q_SCALE))
    )
    upper = (
        mom.join(si, F.col("i") == F.col("_i"))
        .join(sj, F.col("j") == F.col("_j"))
        .crossJoin(F.broadcast(n))
        .select("i", "j", cov_ij.alias("cov"), "n")
    )
    full = upper.unionByName(
        upper.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "cov", "n"
        )
    )
    rows = full.groupBy("i", "n").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "cov"))),
            lambda s: s["cov"],
        ).alias("row")
    )
    return rows.groupBy("n").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "row"))),
            lambda s: s["row"],
        ).alias("cov"),
    ).select(
        "n",
        "cov",
        F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.element_at(
                    F.element_at(F.col("cov"), i + 1), i + 1
                ),
            ),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        ).alias("trace"),
    )


def _matvec(mat, vec):
    """C.v with the j-fold pinned: per row, multiply elementwise in
    index order and fold the sum from 0.0."""
    return F.transform(
        mat,
        lambda row: F.aggregate(
            F.zip_with(row, vec, lambda a, b: a * b),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        ),
    )


def _norm(vec):
    return F.sqrt(
        F.aggregate(
            F.transform(vec, lambda x: x * x),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )


def power_top_eigen(cov_row: DataFrame, dim: int = 64, iters: int = 8):
    """Power iteration on the one-row covariance frame: v0 = all ones,
    ``iters`` steps of v <- C.v / ||C.v||, then the Rayleigh quotient
    lambda = v . (C.v). Returns a one-row frame (n, trace, v
    array<double>, eigenvalue double). Fixed iteration count — no
    convergence test by design (module doc); localCheckpoint per step
    keeps the plan linear in ``iters``."""
    cur = cov_row.select(
        "n",
        "trace",
        "cov",
        F.array_repeat(F.lit(1.0).cast("double"), dim).alias("v"),
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        stepped = (
            cur.select(
                "n",
                "trace",
                "cov",
                _matvec(F.col("cov"), F.col("v")).alias("w"),
            )
            .select("n", "trace", "cov", "w", _norm(F.col("w")).alias("nrm"))
            .select(
                "n",
                "trace",
                "cov",
                F.transform(
                    F.col("w"), lambda x: x / F.col("nrm")
                ).alias("v"),
            )
        )
        cur = stepped.localCheckpoint(eager=True)
    rayleigh = F.aggregate(
        F.zip_with(
            F.col("v"),
            _matvec(F.col("cov"), F.col("v")),
            lambda a, b: a * b,
        ),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    return cur.select("n", "trace", "v", rayleigh.alias("eigenvalue"))


def mean_vector(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """ONE row: m (array<double>) — the per-dimension mean from the
    same exact 2^-40-grid integer sums as ``covariance_matrix``, with
    the identical pinned rescale ((s1/n)/2^40), so a consumer
    combining the two artifacts (e.g. centered projection) sees one
    consistent quantization."""
    comp = emb.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x")
    ).select(
        "i",
        F.floor(F.col("x") * F.lit(_Q_SCALE))
        .cast("decimal(19,0)")
        .alias("qx"),
    )
    sums = comp.groupBy("i").agg(F.sum("qx").cast("double").alias("s1"))
    n = emb.agg(F.count("*").alias("n"))
    return (
        sums.crossJoin(F.broadcast(n))
        .select(
            "i",
            ((F.col("s1") / F.col("n")) / F.lit(_Q_SCALE)).alias("mi"),
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "mi"))),
                lambda s: s["mi"],
            ).alias("m")
        )
    )
