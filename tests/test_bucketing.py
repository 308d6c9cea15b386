"""Bucketed-table joins: bucketBy on the join key co-locates both sides
so the join plan has NO shuffle exchange — the repeated-workload scale
lever documented in SCALE.md."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark):
    # tables land in ./spark-warehouse (gitignored); warehouse.dir is a
    # static conf that can't move on a live session
    orders = spark.range(10000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 500).alias("o_custkey"),
        (F.rand(1) * 1000).alias("o_totalprice"),
    )
    li = spark.range(40000).select(
        (F.col("id") % 10000).alias("l_orderkey"),
        (F.rand(2) * 50).alias("l_quantity"),
    )
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).saveAsTable("b_orders")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).saveAsTable("b_lineitem")
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    # disable broadcast so the plan shows the bucket-co-location effect
    # (at real scale neither side would broadcast anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides bucketed on the key -> SortMergeJoin, zero Exchange
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 40000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_unbucketed_join_does_shuffle(bucketed):
    spark = bucketed
    bo = spark.table("b_orders")
    plain = spark.range(40000).select((F.col("id") % 10000).alias("l_orderkey"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(plain, bo.o_orderkey == plain.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan  # the contrast case
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
