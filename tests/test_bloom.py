"""Bloom-filter join pruning: Catalyst runtime-filter injection on the
semi-join shape, and the explicit bloom_prune operator (no false
negatives, bounded false positives, join-equivalence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blspark.ext.bloom import bloom_params, bloom_prune, build_bloom
from tests.conftest import SF_ORACLE


def test_runtime_bloom_filter_injected(spark):
    """Spark's InjectRuntimeFilter plants might_contain on the fact side
    of a shuffle join whose build side has a selective filter."""
    conf_keys = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in conf_keys}
    try:
        for k, v in conf_keys.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
        # and the filtered join still returns the exact join result
        expected = li.join(
            orders.hint("broadcast"), li.l_orderkey == orders.o_orderkey
        ).count()
        assert j.count() == expected
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_bloom_params_sane():
    m, k = bloom_params(1000, 0.01)
    assert m % 64 == 0 and m >= 9000  # ~9.6 bits/key at 1% fp
    assert 5 <= k <= 10
    m1, k1 = bloom_params(0, 0.01)
    assert m1 >= 64 and k1 >= 1


def test_build_bloom_distributed_wordcount(spark):
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    m, kh = bloom_params(500, 0.01)
    arr = build_bloom(keys, "k", m, kh)
    assert len(arr) == m // 64
    nbits = sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in arr.tolist())
    # k*n hashed insertions, minus collisions: more than half distinct
    assert 500 * kh / 2 < nbits <= 500 * kh


def test_bloom_prune_no_false_negatives_and_bounded_fp(spark):
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    cust = spark.read.parquet(f"{SF_ORACLE}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    pruned = bloom_prune(orders, cust, "o_custkey", "c_custkey", fp_rate=0.01)

    true_keys = {r["c_custkey"] for r in cust.select("c_custkey").collect()}
    kept = pruned.select("o_orderkey", "o_custkey").collect()
    orig = orders.select("o_orderkey", "o_custkey").collect()

    kept_matching = {r["o_orderkey"] for r in kept if r["o_custkey"] in true_keys}
    orig_matching = {r["o_orderkey"] for r in orig if r["o_custkey"] in true_keys}
    assert kept_matching == orig_matching  # Bloom never drops a present key

    n_nonmatching_orig = sum(1 for r in orig if r["o_custkey"] not in true_keys)
    n_nonmatching_kept = sum(1 for r in kept if r["o_custkey"] not in true_keys)
    # ~1% target; assert a loose 5x bound to stay robust to key skew
    assert n_nonmatching_kept <= max(50, 0.05 * n_nonmatching_orig)


def test_bloom_prune_then_join_equals_plain_join(spark):
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    cust = spark.read.parquet(f"{SF_ORACLE}/customer.parquet").filter(
        F.col("c_acctbal") > 9000
    )
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_custkey"
    )
    pruned = bloom_prune(orders, cust, "o_custkey", "c_custkey").join(
        cust, F.col("o_custkey") == cust.c_custkey
    ).select("o_orderkey", "c_custkey")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, pruned.collect())
    )
