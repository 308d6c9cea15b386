"""Invariant tests for the third-batch round-4 operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from blspark.catalog import registry
from tests.conftest import SF_SMOKE

REG = registry()


def test_bpe_fold_known_cases(spark):
    """Greedy left-to-right non-overlap merge on hand-checked inputs."""
    from blspark.queries.extensions5 import _bpe_fold

    df = spark.createDataFrame(
        [("a|a|a|a|a|a",), ("a|b|a|b",), ("a",), ("b|a|a",)], "enc string"
    )
    out = [
        r.m
        for r in df.select(
            _bpe_fold(F.split("enc", "[|]"), "a", "a").alias("m")
        ).collect()
    ]
    assert out == ["aa|aa|aa", "a|b|a|b", "a", "b|aa"]


def test_bpe_known_tiny_corpus(spark, tmp_path):
    """3 merges on a constructed corpus follow max-count + lexicographic
    tie-break, and token frequencies are conserved."""
    import shutil

    sf = tmp_path / "sf"
    sf.mkdir()
    # corpus: 'ab' x4, 'abc' x2 -> pair counts: (a,b)=6, (b,c)=2
    docs = [(0, "ab ab ab ab abc abc", "en", "s", 10)]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))
    out = {r.token: r.freq for r in REG["x_tokenizer_bpe"].spark_fn(spark, str(sf)).collect()}
    # merge1: (a,b)->ab (count 6); merge2: (ab,c)->abc (count 2);
    # merge3 runs on no remaining pairs... actually after merge2 all
    # words are single tokens; merge3 has an empty pair table.
    assert out == {"ab": 4, "abc": 2}


def test_bpe_vocab_conserves_total_chars(spark):
    """Merging never creates or destroys characters: sum(freq * n_chars)
    over the final vocab equals total [a-z]+ word chars in the corpus."""
    from blspark.catalog import load_table

    out = REG["x_tokenizer_bpe"].spark_fn(spark, SF_SMOKE)
    vocab_chars = out.agg(
        F.sum(F.col("freq") * F.col("n_chars")).alias("s")
    ).collect()[0].s
    words = (
        load_table(spark, SF_SMOKE, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
    )
    corpus_chars = words.agg(F.sum(F.length("w")).alias("s")).collect()[0].s
    assert vocab_chars == corpus_chars


def test_graph_triangles_planted(spark):
    """A hand-built edge set with one triangle and one open wedge."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a long, b long"
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .count()
    )
    assert tri == 1


def test_percent_rank_cume_bounds(spark):
    out = REG["q_percent_rank_cume"].spark_fn(spark, SF_SMOKE)
    bad = out.filter(
        (F.col("pct_rank") < 0)
        | (F.col("pct_rank") > 1)
        | (F.col("cume") <= 0)
        | (F.col("cume") > 1)
    ).count()
    assert bad == 0
    # per partition: max cume == 1, min pct_rank == 0
    agg = out.groupBy("event_type").agg(
        F.max("cume").alias("mx"), F.min("pct_rank").alias("mn")
    )
    assert agg.filter((F.col("mx") != 1.0) | (F.col("mn") != 0.0)).count() == 0


def test_dedup_pipeline_lsh_partitions_corpus_and_refines_exact(spark):
    """Survivor counts partition the corpus, every survivor is a member
    of its cluster (>= its min-id label), and the LSH-candidate graph's
    components REFINE the exact-pairs components (LSH can only miss
    edges, never invent them)."""
    from blspark.ext.dedup import (
        connected_components,
        jaccard_pairs,
        word_shingles,
    )
    from blspark.queries.extensions import _corpus

    rows = REG["x_dedup_pipeline_lsh"].spark_fn(spark, SF_SMOKE).collect()
    corpus = _corpus(spark, SF_SMOKE)
    assert sum(r.n_members for r in rows) == corpus.count()
    for r in rows:
        assert r.survivor_id >= r.component

    sh = word_shingles(corpus, "doc_id", "text", n=3)
    exact_pairs = jaccard_pairs(sh, min_jaccard=0.6).select("id_a", "id_b")
    exact = {
        r.node: r.component
        for r in connected_components(
            exact_pairs, corpus.select("doc_id"), id_col="doc_id"
        ).collect()
    }
    # refinement: all members of one LSH component share one exact component.
    # survivors stand in for their cluster; min-id label is itself a member.
    for r in rows:
        assert exact[r.survivor_id] == exact[r.component]


def test_bpe_apply_token_counts_bounded_by_words_and_chars(spark):
    """Per doc: n_tokens is between n_words (fully merged) and the
    total char count (no merges), and total tokens across docs equals
    sum(freq * len(enc)) over the learned vocab state."""
    from blspark.catalog import load_table
    from blspark.queries.extensions5 import _bpe_learn

    out = REG["x_tokenizer_bpe_apply"].spark_fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents")
    chars = {
        r.doc_id: r.c
        for r in docs.select(
            "doc_id",
            F.aggregate(
                F.filter(
                    F.split("text", " "), lambda w: w.rlike("^[a-z]+$")
                ),
                F.lit(0),
                lambda acc, w: acc + F.length(w),
            ).alias("c"),
        ).collect()
    }
    for r in out:
        assert r.n_words <= r.n_tokens <= chars[r.doc_id], r.doc_id

    state = {
        r.w: r
        for r in _bpe_learn(spark, SF_SMOKE)
        .select("w", "freq", F.size(F.split("enc", "[|]")).alias("n"))
        .collect()
    }
    total_from_state = sum(r.freq * r.n for r in state.values())
    assert total_from_state == sum(r.n_tokens for r in out)
