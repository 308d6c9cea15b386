"""Unit tests for the cogrouped merge_asof as-of join."""

from __future__ import annotations

import datetime as dt

from blspark.ext.asof import asof_join

D = dt.datetime


def test_asof_backward_strict(spark):
    trades = spark.createDataFrame(
        [
            (1, D(2024, 1, 1, 10, 0), "t1"),
            (1, D(2024, 1, 1, 11, 0), "t2"),
            (2, D(2024, 1, 1, 10, 30), "t3"),
        ],
        "acct int, ts timestamp, trade string",
    )
    quotes = spark.createDataFrame(
        [
            (1, D(2024, 1, 1, 9, 59), 100.0),
            (1, D(2024, 1, 1, 10, 0), 101.0),   # exact match: excluded (strict)
            (1, D(2024, 1, 1, 10, 30), 102.0),
            (2, D(2024, 1, 1, 11, 0), 200.0),   # after the trade: no match
        ],
        "acct int, ts timestamp, px double",
    )
    out = {
        r["trade"]: r
        for r in asof_join(
            trades, quotes, on="ts", by="acct", right_cols=["ts", "px"],
            allow_exact_matches=False,
        ).collect()
    }
    assert out["t1"]["px_prev"] == 100.0  # 10:00 quote excluded, strict <
    assert out["t2"]["px_prev"] == 102.0
    assert out["t3"]["px_prev"] is None  # quote is later -> unmatched


def test_asof_tie_breaks_to_max_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, D(2024, 1, 2), "L")], "k int, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, D(2024, 1, 1), 7), (1, D(2024, 1, 1), 9), (1, D(2024, 1, 1), 8)],
        "k int, ts timestamp, rid int",
    )
    out = asof_join(
        left, right, on="ts", by="k", right_cols=["ts", "rid"], tiebreak=["rid"]
    ).collect()
    assert out[0]["rid_prev"] == 9  # max tiebreak among equal keys


def test_asof_exact_matches_allowed(spark):
    left = spark.createDataFrame([(1, D(2024, 1, 1), "L")], "k int, ts timestamp, t string")
    right = spark.createDataFrame([(1, D(2024, 1, 1), 5.0)], "k int, ts timestamp, v double")
    out = asof_join(
        left, right, on="ts", by="k", right_cols=["v"], allow_exact_matches=True
    ).collect()
    assert out[0]["v_prev"] == 5.0


def test_window_variant_equals_pandas_variant(spark):
    from blspark.ext.asof import asof_join_window
    import datetime as dt

    D = dt.datetime
    left = spark.createDataFrame(
        [
            (1, D(2024, 1, 1, 10, 0), "t1"),
            (1, D(2024, 1, 1, 11, 0), "t2"),
            (2, D(2024, 1, 1, 10, 30), "t3"),
            (3, D(2024, 1, 1, 9, 0), "t4"),  # key with no right rows
        ],
        "acct int, ts timestamp, trade string",
    )
    right = spark.createDataFrame(
        [
            (1, D(2024, 1, 1, 9, 59), 100.0),
            (1, D(2024, 1, 1, 10, 0), 101.0),
            (1, D(2024, 1, 1, 10, 30), 102.0),
            (2, D(2024, 1, 1, 11, 0), 200.0),
        ],
        "acct int, ts timestamp, px double",
    )
    for exact in (False, True):
        a = {
            r["trade"]: (r["ts_prev"], r["px_prev"])
            for r in asof_join(
                left, right, on="ts", by="acct", right_cols=["ts", "px"],
                allow_exact_matches=exact,
            ).collect()
        }
        b = {
            r["trade"]: (r["ts_prev"], r["px_prev"])
            for r in asof_join_window(
                left, right, on="ts", by="acct", right_cols=["ts", "px"],
                allow_exact_matches=exact,
            ).collect()
        }
        assert a == b, f"exact={exact}: {a} vs {b}"
