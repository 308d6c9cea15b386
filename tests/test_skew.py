"""Salted skew-join: result-invariance vs the plain join, left-join null
semantics, and the spread property (a hot key actually fans out over
multiple (key, salt) groups)."""

from __future__ import annotations

from pyspark.sql import functions as F

from blspark.ext.skew import SALT_COL, row_salt, salted_join


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def _skewed_frames(spark):
    # probe: key 1 is hot (600 rows), keys 2..20 have 10 rows each
    probe = spark.range(600).select(
        F.lit(1).alias("k"), (F.col("id") * 7).alias("pv")
    )
    tail = spark.range(190).select(
        (F.col("id") % 19 + 2).cast("int").alias("k"), (F.col("id") + 1000).alias("pv")
    )
    probe = probe.unionByName(tail)
    # build: keys 1..15 only (so 16..20 dangle on the probe side)
    build = spark.range(15).select(
        (F.col("id") + 1).cast("int").alias("bk"), (F.col("id") * 100).alias("bv")
    )
    return probe, build


def test_salted_inner_join_matches_plain(spark):
    probe, build = _skewed_frames(spark)
    got = salted_join(probe, build, "k", "bk", num_salts=8)
    want = probe.join(build, probe.k == build.bk)
    cols = ["k", "pv", "bk", "bv"]
    assert _rows(got, cols) == _rows(want, cols)
    assert SALT_COL not in got.columns


def test_salted_left_join_matches_plain(spark):
    probe, build = _skewed_frames(spark)
    got = salted_join(probe, build, "k", "bk", num_salts=4, how="left")
    want = probe.join(build, probe.k == build.bk, "left")
    cols = ["k", "pv", "bk", "bv"]
    assert _rows(got, cols) == _rows(want, cols)


def test_hot_key_spreads_across_salts(spark):
    probe, _ = _skewed_frames(spark)
    salted = probe.withColumn(SALT_COL, row_salt(probe, 8))
    spread = (
        salted.filter(F.col("k") == 1).select(SALT_COL).distinct().count()
    )
    # 600 hot rows over 8 salts: every salt value should be hit
    assert spread == 8


def test_row_salt_deterministic(spark):
    probe, _ = _skewed_frames(spark)
    a = _rows(probe.withColumn("s", row_salt(probe, 8)), ["k", "pv", "s"])
    b = _rows(probe.withColumn("s", row_salt(probe, 8)), ["k", "pv", "s"])
    assert a == b


def test_salted_join_rejects_unsupported_how(spark):
    probe, build = _skewed_frames(spark)
    import pytest

    with pytest.raises(ValueError):
        salted_join(probe, build, "k", "bk", how="full")


def test_quantize_roundtrip_error_bound(spark):
    """Dequantized int8 values reconstruct each embedding element within
    half a quantization step (maxabs/127/2)."""
    from blspark.catalog import registry
    from tests.conftest import SF_SMOKE

    q = registry()["x_embed_quantize"].spark_fn(spark, SF_SMOKE)
    emb = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
        )
        .withColumnRenamed("vec_id", "e_vec_id")
    )
    maxabs = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select(
            F.col("vec_id").alias("m_vec_id"),
            F.array_max(
                F.transform(F.col("embedding").cast("array<double>"), F.abs)
            ).alias("maxabs"),
        )
    )
    joined = (
        q.join(emb, (q.vec_id == emb.e_vec_id) & (q.pos == emb.pos))
        .join(maxabs, q.vec_id == F.col("m_vec_id"))
        .select(
            (F.abs(F.col("x") - F.col("qval") * F.col("maxabs") / 127.0)
             - F.col("maxabs") / 254.0).alias("excess")
        )
    )
    worst = joined.agg(F.max("excess")).first()[0]
    assert worst <= 1e-12


def test_fan_out_widens_small_scan_and_preserves_results(spark):
    """fan_out raises partition count for an under-split local scan and
    never changes row content; an already-wide frame passes through
    untouched (no extra shuffle node)."""
    from blspark.ops import fan_out
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    wide = fan_out(docs)
    assert wide.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    a = sorted(map(tuple, docs.select("doc_id", "text").collect()))
    b = sorted(map(tuple, wide.select("doc_id", "text").collect()))
    assert a == b

    rng = spark.range(0, 1000)  # non-file source: gate passes through
    assert fan_out(rng) is rng
