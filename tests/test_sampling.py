"""Hash-min weighted sampling (ext/sampling) and cell-prototype
coreset selection (ext/similarity.cell_prototypes) properties."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from blspark.ext.sampling import hashmin_key, weighted_topn
from blspark.ext.similarity import cell_prototypes, label_centroids
from tests.conftest import SF_SMOKE


def _py_key(doc_id: int, w: int) -> int:
    """Independent reimplementation of the hash-min key (hashlib, no
    Spark/DuckDB) — a third engine for the parity triangle."""
    return min(
        int(hashlib.md5(f"{doc_id}:{j}".encode()).hexdigest()[:12], 16)
        for j in range(1, w + 1)
    )


def test_hashmin_key_matches_independent_md5(spark):
    df = spark.createDataFrame(
        [(7, 1), (8, 3), (9, 8), (12345, 5)], "id long, w int"
    )
    rows = hashmin_key(df, "id", "w").collect()
    for r in rows:
        assert r["skey"] == _py_key(r["id"], r["w"]), r


def test_hashmin_key_overflow_error_mode(spark):
    """overflow='error' surfaces out-of-contract weights (silent clamp
    would bias the draw set); in-contract weights behave identically
    to the default clamp mode."""
    import pytest

    ok = spark.createDataFrame([(1, 8), (2, None)], "id long, w int")
    assert {
        r["id"]: r["skey"]
        for r in hashmin_key(ok, "id", "w", overflow="error").collect()
    } == {r["id"]: r["skey"] for r in hashmin_key(ok, "id", "w").collect()}

    bad = spark.createDataFrame([(3, 9)], "id long, w int")
    with pytest.raises(Exception, match="MAX_WEIGHT"):
        hashmin_key(bad, "id", "w", overflow="error").collect()
    with pytest.raises(ValueError, match="overflow"):
        hashmin_key(bad, "id", "w", overflow="warn")


def test_hashmin_key_monotone_in_weight(spark):
    """min over 1..8 draws is a min over a superset of 1..1 — raising
    any item's weight can only lower (never raise) its key. This is
    the nesting that makes successive selection without-replacement
    consistent."""
    ids = spark.range(0, 500).select(F.col("id"))
    k1 = {
        r["id"]: r["skey"]
        for r in hashmin_key(
            ids.withColumn("w", F.lit(1)), "id", "w"
        ).collect()
    }
    k8 = {
        r["id"]: r["skey"]
        for r in hashmin_key(
            ids.withColumn("w", F.lit(8)), "id", "w"
        ).collect()
    }
    assert all(k8[i] <= k1[i] for i in k1)
    assert any(k8[i] < k1[i] for i in k1)  # 8x draws do move the min


def test_weighted_topn_heavier_overrepresented(spark):
    """With weights {1, 8} split evenly across 2000 ids, the top-200
    winners skew ~8:1 toward the heavy half (exactness of P = w/sum(w)
    shows up as a strong, deterministic skew on a fixed hash)."""
    df = spark.range(0, 2000).select(
        "id", (F.when(F.col("id") % 2 == 0, 8).otherwise(1)).alias("w")
    )
    win = weighted_topn(df, "id", "w", 200).collect()
    heavy = sum(1 for r in win if r["w"] == 8)
    assert len(win) == 200
    # E[heavy] = 200 * 8/9 ~ 178; demand a loose one-sided bound
    assert heavy > 150, heavy


def test_weighted_topn_plan_no_shuffle(spark):
    """Key construction is map-side and top-n is TakeOrderedAndProject:
    no Exchange anywhere in the physical plan."""
    df = spark.range(0, 1000).select("id", F.lit(3).alias("w"))
    plan = (
        weighted_topn(df, "id", "w", 50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_cell_prototypes_argmax_and_sizes(spark):
    """The prototype is its cell's true argmax-by-centroid-cosine
    (verified against an independent per-member recompute), sizes sum
    to the corpus, and every prototype belongs to its own cell."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cents = label_centroids(emb).withColumn(
        "cell_id", F.col("cell_id").cast("int")
    )
    protos = {
        r["cell_id"]: (r["prototype_id"], r["centrality"], r["cell_size"])
        for r in cell_prototypes(emb, cents).collect()
    }
    # independent recompute: cosine of every member to every centroid
    cent_rows = {
        r["cell_id"]: r["centroid"] for r in cents.collect()
    }
    members = {}
    for r in emb.select("vec_id", "embedding").collect():
        v = [float(x) for x in r["embedding"]]
        nv = sum(x * x for x in v) ** 0.5
        best = None
        for cid in sorted(cent_rows):
            c = cent_rows[cid]
            nc = sum(x * x for x in c) ** 0.5
            sim = sum(a * b for a, b in zip(v, c)) / (nv * nc)
            if best is None or sim > best[1] + 1e-12:
                best = (cid, sim)
        members.setdefault(best[0], []).append((r["vec_id"], best[1]))
    n = emb.count()
    assert sum(sz for _, _, sz in protos.values()) == n
    for cid, ms in members.items():
        pid, cent_sim, sz = protos[cid]
        assert sz == len(ms)
        top = max(ms, key=lambda t: (t[1], -t[0]))
        assert pid == top[0], (cid, pid, top)
        assert abs(cent_sim - top[1]) < 1e-5


def test_hashmin_key_clamps_null_and_subone_weights(spark):
    """NULL / 0 / negative weights clamp to one draw — never the
    descending-sequence double-draw, never a NULL key (which would
    sort NULLS FIRST into the sample in Spark but last in DuckDB)."""
    df = spark.createDataFrame(
        [(1, None), (2, 0), (3, -4), (4, 1)], "id long, w int"
    )
    keys = {r["id"]: r["skey"] for r in hashmin_key(df, "id", "w").collect()}
    one = {
        r["id"]: r["skey"]
        for r in hashmin_key(
            spark.createDataFrame([(1, 1), (2, 1), (3, 1)], "id long, w int"),
            "id",
            "w",
        ).collect()
    }
    assert None not in keys.values()
    for i in (1, 2, 3):
        assert keys[i] == one[i] == _py_key(i, 1)


def test_per_source_prefilter_is_transparent(spark):
    """The skew prefilter must be an exactness-preserving superset:
    the PRODUCTION query's output (which routes through
    source_cap_prefilter) equals the plain per-source window over the
    shared keyed frame with no prefilter at all."""
    from pyspark.sql import Window

    from blspark.catalog import registry
    from blspark.queries.extensions10 import _WS_SRC_K, _ws_keyed

    direct = {
        tuple(r)
        for r in _ws_keyed(spark, SF_SMOKE)
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.partitionBy("source").orderBy(
                    F.asc("skey"), F.asc("doc_id")
                )
            )
            .cast("int"),
        )
        .filter(F.col("rank") <= _WS_SRC_K)
        .select("source", "doc_id", "weight", "skey", "rank")
        .collect()
    }
    q = registry()["x_sample_weighted_per_source"]
    via_query = {tuple(r) for r in q.spark_fn(spark, SF_SMOKE).collect()}
    assert direct == via_query
    assert len(direct) > 0


def test_weighted_topn_query_plan_no_shuffle(spark):
    """The REGISTERED top-n query (not just the library helper) keeps
    the TakeOrderedAndProject / zero-Exchange shape end to end — the
    keyed projection must never grow a join or aggregate."""
    from blspark.catalog import registry

    q = registry()["x_sample_weighted_topn"]
    plan = (
        q.spark_fn(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
