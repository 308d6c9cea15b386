"""Invariant tests for the fifth-batch round-4 operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from blspark.catalog import registry
from tests.conftest import SF_SMOKE

REG = registry()


def test_scd2_temporal_join_partitions_orders(spark):
    """Every order matches exactly one dimension version: the grouped
    counts sum to the order count."""
    from blspark.catalog import load_table

    out = REG["q_scd2_temporal_join"].spark_fn(spark, SF_SMOKE).collect()
    n_orders = load_table(spark, SF_SMOKE, "orders").count()
    assert sum(r.n_orders for r in out) == n_orders
    # upgraded segment only exists after the v2 cutover
    assert any(r.segment_at_order == "UPGRADED" for r in out)


def test_event_transitions_probabilities_normalize(spark):
    out = REG["x_event_transitions"].spark_fn(spark, SF_SMOKE).collect()
    by_prev: dict[str, float] = {}
    for r in out:
        assert r.n > 0 and 0 < r.p <= 1
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-9, prev


def test_feature_hashing_buckets_bounded_and_counts_conserved(spark):
    from blspark.catalog import load_table

    out = REG["x_feature_hashing"].spark_fn(spark, SF_SMOKE)
    rows = out.collect()
    assert all(0 <= r.bucket < 64 for r in rows)
    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.col("doc_id") < 200
    )
    n_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("s")
    ).collect()[0].s
    assert sum(r.cnt for r in rows) == n_tokens


def test_class_weights_weighted_total_balances(spark):
    """sum(n_k * w_k) == N: the defining property of inverse-frequency
    weights (every class contributes equal total weight N/K)."""
    out = REG["x_class_weights"].spark_fn(spark, SF_SMOKE).collect()
    total = sum(r.n for r in out)
    k = len(out)
    for r in out:
        assert abs(r.weight - total / (k * r.n)) < 1e-12
    assert abs(sum(r.n * r.weight for r in out) - total) < 1e-6


def test_window_time_range_counts_match_bruteforce(spark):
    """RANGE-frame counts equal a per-row brute-force recount on a
    small slice."""
    from blspark.catalog import load_table

    out = {
        r.event_id: r.n_1h
        for r in REG["q_window_time_range"].spark_fn(spark, SF_SMOKE).collect()
    }
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_id") < 10000)
        .select("event_id", "user_id", F.unix_micros("ts").alias("us"))
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    for rows in by_user.values():
        for r in rows:
            n = sum(1 for x in rows if r.us - 3_600_000_000 <= x.us <= r.us)
            assert out[r.event_id] == n, r.event_id


def test_xml_roundtrip_schema(spark):
    out = REG["x_xml_roundtrip"].spark_fn(spark, SF_SMOKE).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_docs > 0 and r.total_chars > 0 and r.n_distinct_texts > 0


def test_asof_nearest_click_planted(spark, tmp_path):
    """Hand-built stream: purchase at t=100 with clicks at 60 and 130
    picks the nearer 'after' click (delta 30); purchase at t=200 with
    equidistant clicks picks 'before' (tie-break earlier)."""
    import shutil

    from blspark.catalog import registry

    sf = tmp_path / "sf"
    sf.mkdir()
    us = lambda s: s * 1_000_000
    rows = [
        (1, us(60), 7, "click"),
        (2, us(100), 7, "purchase"),
        (3, us(130), 7, "click"),
        (4, us(170), 7, "click"),
        (5, us(200), 7, "purchase"),
        (6, us(230), 7, "click"),
        (7, us(500), 8, "purchase"),  # no clicks for user 8 -> excluded
    ]
    import datetime

    spark.createDataFrame(
        [
            (i, datetime.datetime.utcfromtimestamp(t / 1e6), u, ty, 1.0, "{}")
            for (i, t, u, ty) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(sf / "events.parquet"))
    out = {
        r.event_id: (r.delta_us, r.dir)
        for r in registry()["q_asof_nearest_click"].spark_fn(spark, str(sf)).collect()
    }
    assert out[2] == (us(30), "after")
    assert out[5] == (us(30), "before")  # tie at 30s both ways
    assert 7 not in out
    shutil.rmtree(sf, ignore_errors=True)
