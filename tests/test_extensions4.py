"""Invariant tests for the late-round-4 operators (beyond the oracle
differential): structural contracts that must hold at any scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from blspark.catalog import registry
from tests.conftest import SF_SMOKE

REG = registry()


def test_lm_bigram_score_bounds_and_known_corpus(spark):
    out = REG["x_lm_bigram_score"].spark_fn(spark, SF_SMOKE)
    rows = out.collect()
    for r in rows:
        # every bigram occurs at least once (itself): avg_freq >= 1,
        # rare_frac in [0, 1], sum_freq >= n_bigrams
        assert r.avg_freq >= 1.0, r
        assert 0.0 <= r.rare_frac <= 1.0, r
        assert r.sum_freq >= r.n_bigrams, r
    # hand-built corpus: "a b a b" has bigrams [a b, b a, a b];
    # "a b c" has [a b, b c]. Corpus counts: "a b"->3, "b a"->1, "b c"->1.
    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c")], "doc_id long, text string"
    )
    from blspark.queries.extensions4 import _bigrams

    bg = _bigrams(df)
    cnt = bg.groupBy("b").agg(F.count("*").alias("c"))
    got = {r.b: r.c for r in cnt.collect()}
    assert got == {"a b": 3, "b a": 1, "b c": 1}


def test_agg_state_merge_equals_direct(spark):
    """The algebraic-aggregate law the operator exists to demonstrate:
    merging shard partials equals aggregating the base rows directly."""
    from blspark.catalog import load_table

    merged = {
        r.source: (r.n_docs, r.total_chars, r.min_chars, r.max_chars)
        for r in REG["x_agg_state_merge"].spark_fn(spark, SF_SMOKE).collect()
    }
    direct = {
        r.source: (r.n_docs, r.total_chars, r.min_chars, r.max_chars)
        for r in load_table(spark, SF_SMOKE, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .collect()
    }
    assert merged == direct


def test_mad_outliers_planted(spark, tmp_path):
    """A planted far outlier is flagged; tight-cluster rows are not."""
    import shutil

    sf = tmp_path / "sf"
    sf.mkdir()
    for t in ("events",):
        rows = [(i, None, i % 5, "t", 10.0 + (i % 7) * 0.1, "{}") for i in range(200)]
        rows.append((999, None, 0, "t", 1e6, "{}"))
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).coalesce(1).write.parquet(str(sf / f"{t}.parquet"))
    out = REG["x_mad_outliers"].spark_fn(spark, str(sf)).collect()
    ids = {r.event_id for r in out}
    assert 999 in ids
    # the tight cluster spans 10.0..10.6 (MAD ~ 0.2): none flagged
    assert ids == {999}
    shutil.rmtree(sf, ignore_errors=True)


def test_bloom_prune_keeps_all_true_keys_composition_exact(spark):
    """bloom_prune never drops a present key, and the pruned+exact-join
    composition equals the plain semi join row-for-row."""
    from blspark.catalog import load_table
    from blspark.ext.bloom import bloom_prune

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    keys = (
        load_table(spark, SF_SMOKE, "part")
        .filter(F.col("p_size") == 10)
        .select("p_partkey")
    )
    plain = li.join(
        keys.withColumnRenamed("p_partkey", "l_partkey"), "l_partkey", "semi"
    )
    pruned = bloom_prune(li, keys, "l_partkey", "p_partkey")
    composed = pruned.join(
        keys.withColumnRenamed("p_partkey", "l_partkey"), "l_partkey", "semi"
    )
    # no false negatives: plain ⊆ pruned
    assert plain.join(pruned, ["l_orderkey", "l_partkey"], "anti").count() == 0
    assert sorted(map(tuple, composed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_listagg_sorted_partition_invariant(spark):
    """The sorted-set aggregation is identical however the input is
    partitioned (a bare collect_list would not be)."""
    from blspark.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    a = REG["x_listagg_sorted"].spark_fn(spark, SF_SMOKE)
    b = (
        docs.repartition(17, "doc_id")
        .groupBy("source")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("lang"))).alias(
                "langs"
            )
        )
    )
    got_a = {r.source: r.langs for r in a.collect()}
    got_b = {r.source: r.langs for r in b.collect()}
    assert got_a == got_b
    for langs in got_a.values():
        parts = langs.split(",")
        assert parts == sorted(parts) and len(set(parts)) == len(parts)


def test_word_diversity_extremes(spark, tmp_path):
    """All-same-word doc -> simpson 0, ttr 1/n; all-distinct doc ->
    simpson 1 - 1/n, ttr 1."""
    import shutil

    sf = tmp_path / "sf"
    sf.mkdir()
    docs = [
        (0, " ".join(["x"] * 10), "en", "s", 10),
        (1, " ".join(f"w{i}" for i in range(10)), "en", "s", 10),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))
    out = {r.doc_id: r for r in REG["x_word_diversity"].spark_fn(spark, str(sf)).collect()}
    assert out[0].n_types == 1 and abs(out[0].simpson) < 1e-12
    assert abs(out[0].ttr - 0.1) < 1e-12
    assert out[1].n_types == 10 and abs(out[1].ttr - 1.0) < 1e-12
    assert abs(out[1].simpson - 0.9) < 1e-12
    shutil.rmtree(sf, ignore_errors=True)
