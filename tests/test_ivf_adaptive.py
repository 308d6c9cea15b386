"""Query-adaptive IVF probing properties: degenerate thresholds
collapse to the fixed-nprobe operator exactly; the probe list is a
rank-prefix of length probe_lo or probe_hi per query; recall is
monotone between the fixed lo/hi envelopes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blspark.ext.similarity import (
    ivf_adaptive_probe_frame,
    ivf_adaptive_topk,
    ivf_topk,
    label_centroids,
)
from tests.conftest import SF_SMOKE


def _load(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    cents = label_centroids(emb).withColumn(
        "cell_id", F.col("cell_id").cast("int")
    )
    return emb, queries, cents


def _keyed(rows):
    return {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in rows
    }


def test_adaptive_lo_eq_hi_equals_fixed(spark):
    """probe_lo == probe_hi == n short-circuits the margin entirely:
    results must equal ivf_topk(nprobe=n) bit-for-bit (shared
    _ivf_float_rank tail)."""
    emb, queries, cents = _load(spark)
    for n in (1, 2):
        fixed = _keyed(
            ivf_topk(
                emb, queries, cents, vec_col="embedding", k=5, nprobe=n
            ).collect()
        )
        rows = ivf_adaptive_topk(
            emb, queries, cents, vec_col="embedding", k=5,
            probe_lo=n, probe_hi=n, margin_threshold=0.5,
        ).collect()
        assert _keyed(rows) == fixed
        assert all(r["nprobe_used"] == n for r in rows)


def test_adaptive_extreme_thresholds_pick_one_branch(spark):
    """margin_threshold = -1 -> every finite margin qualifies ->
    everyone scans probe_lo (== fixed lo); threshold = 2.0 (no cosine
    margin can exceed 2) -> everyone ambiguous -> fixed hi."""
    emb, queries, cents = _load(spark)
    lo_fixed = _keyed(
        ivf_topk(
            emb, queries, cents, vec_col="embedding", k=5, nprobe=1
        ).collect()
    )
    hi_fixed = _keyed(
        ivf_topk(
            emb, queries, cents, vec_col="embedding", k=5, nprobe=3
        ).collect()
    )
    all_lo = ivf_adaptive_topk(
        emb, queries, cents, vec_col="embedding", k=5,
        probe_lo=1, probe_hi=3, margin_threshold=-1.0,
    ).collect()
    all_hi = ivf_adaptive_topk(
        emb, queries, cents, vec_col="embedding", k=5,
        probe_lo=1, probe_hi=3, margin_threshold=2.0,
    ).collect()
    assert _keyed(all_lo) == lo_fixed
    assert all(r["nprobe_used"] == 1 for r in all_lo)
    assert _keyed(all_hi) == hi_fixed
    assert all(r["nprobe_used"] == 3 for r in all_hi)


def test_adaptive_probe_frame_is_rank_prefix(spark):
    """Every query's probe set has exactly probe_lo or probe_hi cells
    (clamped by |cells|), and with lo == hi the frame equals the
    fixed-nprobe probe list — one code path for both budgets."""
    emb, queries, cents = _load(spark)
    n_cells = cents.count()
    pf = ivf_adaptive_probe_frame(
        queries, cents, vec_col="embedding",
        probe_lo=1, probe_hi=3, margin_threshold=0.05,
    ).collect()
    by_q: dict[int, list] = {}
    for r in pf:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == queries.count()
    for q, rs in by_q.items():
        used = {r["nprobe_used"] for r in rs}
        assert len(used) == 1  # one decision per query
        n = used.pop()
        assert n in (1, 3)
        assert len(rs) == min(n, n_cells)
        assert len({r["cell_id"] for r in rs}) == len(rs)
    fixed2 = {
        (r["query_id"], r["cell_id"])
        for r in ivf_adaptive_probe_frame(
            queries, cents, vec_col="embedding",
            probe_lo=2, probe_hi=2, margin_threshold=0.05,
        ).collect()
    }
    # lo==hi==2 must be exactly the 2-nearest-cells list: a superset of
    # every query's 1-probe list, 2 cells per query
    assert len(fixed2) == 2 * queries.count()


def test_adaptive_recall_between_fixed_envelopes(spark):
    """Adaptive candidates per query are a superset of fixed-lo's and
    a subset of fixed-hi's probed cells, so recall (vs exact, same
    scoring) must sit between the fixed envelopes."""
    from blspark.ext.similarity import cosine_topk
    from tests.test_ivf import _recall_at_k

    emb, queries, cents = _load(spark)
    exact = cosine_topk(emb, queries, k=5).collect()
    r_lo = _recall_at_k(
        exact,
        ivf_topk(
            emb, queries, cents, vec_col="embedding", k=5, nprobe=1
        ).collect(),
    )
    r_hi = _recall_at_k(
        exact,
        ivf_topk(
            emb, queries, cents, vec_col="embedding", k=5, nprobe=3
        ).collect(),
    )
    r_ad = _recall_at_k(
        exact,
        ivf_adaptive_topk(
            emb, queries, cents, vec_col="embedding", k=5,
            probe_lo=1, probe_hi=3, margin_threshold=0.05,
        ).collect(),
    )
    assert r_lo - 1e-9 <= r_ad <= r_hi + 1e-9


def test_adaptive_rejects_inverted_budget(spark):
    emb, queries, cents = _load(spark)
    with pytest.raises(ValueError):
        ivf_adaptive_topk(
            emb, queries, cents, vec_col="embedding", k=5,
            probe_lo=3, probe_hi=1,
        ).collect()


def test_probe_cells_stateless_matches_batch_rule(spark):
    """The streaming routing expression (probe_cells_stateless) must
    be bit-identical to the batch adaptive_probes rule: same decided
    nprobe per query, same cells in the same rank order."""
    from blspark.ext.similarity import (
        _centroid_frame,
        _norm,
        adaptive_probes,
        probe_cells_stateless,
        with_double_vec,
    )

    emb, queries, cents = _load(spark)
    batch = adaptive_probes(
        with_double_vec(queries, "embedding").select(
            F.col("vec_id").alias("query_id"), "vec",
            _norm(F.col("vec")).alias("vnorm"),
        ),
        _centroid_frame(cents),
        "query_id",
        1,
        3,
        0.05,
    ).collect()
    # batch collect() order is not guaranteed — compare as
    # (query -> decided n, cell set); the stateless side's explicit
    # rank ORDER is then checked against a driver-side recomputation
    # with the same left-to-right fold association (bit-identical in
    # IEEE doubles).
    batch_by_q: dict[int, dict] = {}
    for r in batch:
        d = batch_by_q.setdefault(
            r["query_id"], {"n": r["nprobe_used"], "cells": set()}
        )
        assert d["n"] == r["nprobe_used"]
        d["cells"].add(r["cell_id"])

    cent_rows = [
        (r["cell_id"], list(r["centroid"])) for r in cents.collect()
    ]
    stream_like = probe_cells_stateless(
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("vec"),
        ),
        cent_rows,
        probe_lo=1,
        probe_hi=3,
        margin_threshold=0.05,
    ).collect()
    import math

    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in queries.select("vec_id", "embedding").collect()
    }

    def rank_cells(vec):
        vn = math.sqrt(sum(x * x for x in vec))
        out = []
        for cid, cv in sorted(cent_rows):
            cn = math.sqrt(sum(float(x) * float(x) for x in cv))
            d = vn * cn
            s = (
                sum(a * float(b) for a, b in zip(vec, cv)) / d
                if d > 0 else float("-inf")
            )
            out.append((-s, cid))
        return [c for _, c in sorted(out)]

    assert len(stream_like) == len(batch_by_q)
    for r in stream_like:
        b = batch_by_q[r["query_id"]]
        assert r["nprobe_used"] == b["n"]
        assert set(r["probe_cells"]) == b["cells"]
        expected_order = rank_cells(qvecs[r["query_id"]])[
            : len(b["cells"])
        ]
        assert list(r["probe_cells"]) == expected_order


def test_cell_reassign_delta_equals_two_assignments(spark):
    """The one-scan two-argmin composition must equal two separate
    _cell_assign probes=1 calls bit-for-bit — the shared-rule
    guarantee that index maintenance can never drift from serving."""
    from blspark.ext.similarity import (
        _cell_assign,
        _centroid_frame,
        _norm,
        cell_reassign_delta,
        with_double_vec,
    )

    emb, _queries, cents = _load(spark)
    old_cents = label_centroids(
        emb.filter(F.col("vec_id") % 3 != 0)
    ).withColumn("cell_id", F.col("cell_id").cast("int"))

    def assign(c):
        return {
            r["vec_id"]: r["cell_id"]
            for r in _cell_assign(
                with_double_vec(emb, "embedding").select(
                    "vec_id", "vec", _norm(F.col("vec")).alias("vnorm")
                ),
                _centroid_frame(c),
                "vec_id",
                1,
            ).collect()
        }

    expect_old = assign(old_cents)
    expect_new = assign(cents)
    delta = {
        r["vec_id"]: (r["old_cell"], r["new_cell"])
        for r in cell_reassign_delta(emb, old_cents, cents).collect()
    }
    assert set(delta) == set(expect_old) == set(expect_new)
    for vid, (o, n) in delta.items():
        assert o == expect_old[vid]
        assert n == expect_new[vid]


def test_filtered_ann_prefilter_beats_postfilter(spark):
    """The classic filtered-ANN failure, demonstrated on the real
    operators: POST-filtering the unfiltered top-k under-returns
    (measured 0-4 of 5 survivors per query at sf0.01 AND sf0.1 —
    query 13 keeps ZERO at sf0.1), while the registered pre-filtering
    query returns exactly k true filtered neighbors for every query."""
    from blspark.catalog import load_table, registry
    from blspark.queries.extensions9 import _SQ8_K
    from blspark.queries.extensions11 import _FILTER_MAX_LABEL
    from tests.conftest import SF_ORACLE

    reg = registry()
    k = _SQ8_K
    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    unfiltered = reg["x_index_persist_adaptive"].spark_fn(
        spark, SF_ORACLE
    ).collect()
    post: dict[int, int] = {}
    for r in unfiltered:
        post.setdefault(r["query_id"], 0)
        if labels[r["neighbor_id"]] < _FILTER_MAX_LABEL:
            post[r["query_id"]] += 1
    assert any(v < k for v in post.values())  # post-filter shortfall
    pre = reg["x_index_persist_filtered"].spark_fn(
        spark, SF_ORACLE
    ).collect()
    per_q: dict[int, list] = {}
    for r in pre:
        per_q.setdefault(r["query_id"], []).append(r)
        assert r["n_label"] < _FILTER_MAX_LABEL
    assert set(per_q) == set(post)
    assert all(
        sorted(x["rank"] for x in v) == list(range(1, k + 1))
        for v in per_q.values()
    )


def test_ivf_float_probe_join_broadcasts(spark):
    """The float-rung probe join must broadcast the Q x nprobe probe
    list (its window-over-crossJoin lineage defeats Catalyst's size
    estimate, which otherwise shuffles the whole cell-assigned corpus
    on cell_id as a SortMergeJoin — at 100 TB that shuffle IS the
    query cost). Pinned for both the adaptive and fixed operators."""
    from blspark.catalog import registry
    from tests.conftest import SF_ORACLE

    reg = registry()
    for name in ("x_similarity_ivf_adaptive", "x_similarity_ivf_checked"):
        df = reg[name].spark_fn(spark, SF_ORACLE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name
