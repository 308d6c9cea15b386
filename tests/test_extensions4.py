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


def test_keep_best_survivor_is_member_with_max_quality(spark):
    """Every survivor belongs to its component, and no component member
    outranks it on (quality, -doc_id)."""
    from blspark.ext.dedup import (
        connected_components,
        jaccard_pairs,
        word_shingles,
    )
    from blspark.ext.text import quality_score
    from blspark.queries.extensions import _corpus

    out = {r.component: r for r in REG["x_dedup_keep_best"].spark_fn(spark, SF_SMOKE).collect()}
    corpus = _corpus(spark, SF_SMOKE)
    sh = word_shingles(corpus, "doc_id", "text", n=3)
    pairs = jaccard_pairs(sh, min_jaccard=0.6).select("id_a", "id_b")
    comp = connected_components(pairs, corpus.select("doc_id"), id_col="doc_id")
    q = quality_score(corpus, "doc_id", "text").select(
        F.col("id").alias("node"), "quality"
    )
    members = comp.join(q, "node").collect()
    by_comp: dict[int, list] = {}
    for m in members:
        by_comp.setdefault(m.component, []).append(m)
    assert set(out) == set(by_comp)
    for cid, ms in by_comp.items():
        best = max(ms, key=lambda m: (m.quality, -m.node))
        assert out[cid].survivor_id == best.node, cid
        assert out[cid].n_members == len(ms), cid


def test_zorder_layout_bounds_both_dimensions(spark, tmp_path):
    """Sorting files by the Morton key bounds row-group min/max spans in
    BOTH dimensions; a plain single-column sort leaves the other
    dimension's span at ~full domain. This is the stat-pruning effect
    the operator exists for."""
    import pyarrow.parquet as pq

    from blspark.ext.layout import zorder_key
    from blspark.io.sinks import write_layout_parquet

    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") % 128).alias("x"),
        (F.pmod(F.col("id") * 2654435761, F.lit(128))).alias("y"),
    )

    def spans(path):
        sx, sy = [], []
        import glob as g

        for f in g.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                cols = {
                    row.column(i).path_in_schema: row.column(i).statistics
                    for i in range(row.num_columns)
                }
                sx.append(cols["x"].max - cols["x"].min)
                sy.append(cols["y"].max - cols["y"].min)
        return sum(sx) / len(sx), sum(sy) / len(sy)

    zdf = df.withColumn("z", zorder_key("x", "y"))
    write_layout_parquet(
        zdf.repartition(1), str(tmp_path / "zord"), sort_by=("z",),
        max_records_per_file=1024,
    )
    write_layout_parquet(
        df.repartition(1), str(tmp_path / "xsort"), sort_by=("x",),
        max_records_per_file=1024,
    )
    zx, zy = spans(str(tmp_path / "zord"))
    xx, xy = spans(str(tmp_path / "xsort"))
    # plain x-sort: x tightly clustered but y spans ~everything
    assert xx < 16 and xy > 100
    # z-order: BOTH dimensions bounded well below the 127 domain span
    assert zx < 48 and zy < 48


def test_stream_upsert_cdc_matches_batch_last_value(spark):
    """The cross-batch foreachBatch fold equals the batch argmax —
    arrival-order independence of the commutative merge."""
    from blspark.catalog import load_table

    out = {r.user_id: r for r in REG["s_stream_upsert_cdc"].spark_fn(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events")
    batch = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.struct("ts", "event_id", "value")).alias("s"),
            F.count("*").alias("n_events"),
        )
        .collect()
    )
    assert len(out) == len(batch)
    for b in batch:
        r = out[b.user_id]
        assert (r.last_ts, r.last_event_id, r.last_value, r.n_events) == (
            b.s.ts, b.s.event_id, b.s.value, b.n_events,
        ), b.user_id
