"""Session-window equivalence + approximate-sketch accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from blspark.catalog import registry
from tests.conftest import SF_ORACLE


def test_stateful_streaming_matches_batch_sessionize(spark):
    reg = registry()
    batch = {
        (r["user_id"]): (r["n_sessions"], r["n_events"])
        for r in reg["q_events_sessionize"].spark_fn(spark, SF_ORACLE).collect()
    }
    stateful = {
        (r["user_id"]): (r["n_sessions"], r["n_events"])
        for r in reg["s_stream_sessionize_stateful"].spark_fn(spark, SF_ORACLE).collect()
    }
    assert stateful == batch


def test_session_window_count_consistency(spark):
    reg = registry()
    sw = reg["q_events_session_window"].spark_fn(spark, SF_ORACLE)
    per_user = {
        r["user_id"]: r["n"]
        for r in sw.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    sess = {
        r["user_id"]: r["n_sessions"]
        for r in reg["q_events_sessionize"].spark_fn(spark, SF_ORACLE).collect()
    }
    assert per_user == sess


def test_approx_sketches_accuracy(spark, duck):
    from blspark.queries.sessions import approx_sketches_raw

    row = approx_sketches_raw(spark, SF_ORACLE).first()
    exact_parts, exact_orders = duck.execute(
        "SELECT COUNT(DISTINCT l_partkey), COUNT(DISTINCT l_orderkey) FROM lineitem"
    ).fetchone()
    p50, p95 = duck.execute(
        "SELECT quantile_cont(o_totalprice, 0.5), quantile_cont(o_totalprice, 0.95)"
        " FROM orders"
    ).fetchone()
    assert abs(row["approx_parts"] - exact_parts) / exact_parts < 0.05
    assert abs(row["approx_orders"] - exact_orders) / exact_orders < 0.05
    assert abs(row["p50_price"] - p50) / p50 < 0.02
    assert abs(row["p95_price"] - p95) / p95 < 0.02
