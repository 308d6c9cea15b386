"""Degenerate-input behavior: the dedup/similarity/text operator
library must return empty (not crash) on empty corpora, handle
single-document inputs, and tolerate documents shorter than the shingle
width — the boundary conditions a 100 TB run WILL hit in some partition
or some tenant's slice."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOCS_SCHEMA)


def test_empty_corpus_all_dedup_ops(spark):
    from blspark.ext.dedup import (
        exact_dedup_keys,
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        simhash16,
        word_shingles,
    )

    empty = _docs(spark, [])
    assert exact_dedup_keys(empty, "doc_id", "text").count() == 0
    sh = word_shingles(empty, "doc_id", "text", n=3)
    assert sh.count() == 0
    assert jaccard_pairs(sh).count() == 0
    sig = minhash_signatures(sh, n_hashes=8)
    assert sig.count() == 0
    assert lsh_candidate_pairs(sig, n_hashes=8, bands=2).count() == 0
    assert simhash16(empty, "doc_id", "text").count() == 0


def test_single_and_short_documents(spark):
    from blspark.ext.dedup import exact_dedup_keys, jaccard_pairs, word_shingles

    docs = _docs(
        spark,
        [
            (1, "only one document here for the test"),
            (2, "tiny"),  # shorter than the 3-token shingle width
            (3, "two words"),
        ],
    )
    # short docs drop out of shingling but never crash it
    sh = word_shingles(docs, "doc_id", "text", n=3)
    assert sorted(r["id"] for r in sh.select("id").distinct().collect()) == [1]
    # no pair exists -> empty, not an error
    assert jaccard_pairs(sh).count() == 0
    # exact dedup still sees all three
    assert exact_dedup_keys(docs, "doc_id", "text").count() == 3


def test_empty_corpus_similarity(spark):
    from blspark.ext.similarity import cosine_topk

    schema = "vec_id long, embedding array<float>"
    empty = spark.createDataFrame([], schema)
    assert cosine_topk(empty, empty, id_col="vec_id", vec_col="embedding").count() == 0

    one = spark.createDataFrame([(1, [1.0, 0.0]), (2, [0.0, 1.0])], schema)
    out = cosine_topk(one, one.filter(F.col("vec_id") == 1), k=5)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["neighbor_id"] == 2


def test_empty_corpus_text_ops(spark):
    from blspark.ext.text import fingerprint, lang_id, quality_score, token_stats

    empty = _docs(spark, [])
    for fn in (token_stats, quality_score, lang_id, fingerprint):
        assert fn(empty, "doc_id", "text").count() == 0


# --- round-4 second-session operators --------------------------------------


def test_bpe_empty_corpus_no_crash(spark, tmp_path):
    """A corpus with no [a-z]+ words yields an empty vocabulary (the
    empty-pair-table break path), not a crash."""
    import shutil

    from blspark.catalog import registry

    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        [(0, "123 456 789", "en", "s", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))
    out = registry()["x_tokenizer_bpe"].spark_fn(spark, str(sf)).collect()
    assert out == []
    shutil.rmtree(sf, ignore_errors=True)


def test_zorder_key_masks_high_bits(spark):
    """Inputs beyond 16 bits are masked (documented contract), so the
    key of x and x + 65536 is identical."""
    from pyspark.sql import functions as F

    from blspark.ext.layout import zorder_key

    df = spark.createDataFrame(
        [(5, 9), (5 + 65536, 9), (5, 9 + 65536)], "x long, y long"
    )
    keys = [r.z for r in df.select(zorder_key("x", "y").alias("z")).collect()]
    assert keys[0] == keys[1] == keys[2]


def test_survivor_best_all_singletons(spark):
    """No edges: every node is its own component and its own survivor."""
    from blspark.ext.dedup import connected_components, survivor_best

    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges = spark.createDataFrame([], "id_a long, id_b long")
    comp = connected_components(edges, nodes, id_col="id")
    q = spark.createDataFrame(
        [(i, 0.5) for i in range(5)], "node long, quality double"
    )
    out = {r.component: r for r in survivor_best(comp, q).collect()}
    assert set(out) == set(range(5))
    for c, r in out.items():
        assert r.survivor_id == c and r.n_members == 1


def test_mad_outliers_constant_group_emits_nothing(spark, tmp_path):
    """A constant-valued group has MAD 0; with strict >, nothing is
    flagged (and no division is involved, unlike z-scores)."""
    import shutil

    from blspark.catalog import registry

    sf = tmp_path / "sf"
    sf.mkdir()
    rows = [(i, None, 1, "t", 7.0, "{}") for i in range(50)]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(sf / "events.parquet"))
    out = registry()["x_mad_outliers"].spark_fn(spark, str(sf)).collect()
    assert out == []
    shutil.rmtree(sf, ignore_errors=True)


def test_local_relation_is_jvm_local_and_preserves_nan_null(spark):
    """ops.local_relation must (a) rebuild clean metadata frames as a
    true JVM LocalTableScan (no Python-RDD re-entry per action — the
    round-11 5x finding) and (b) route frames whose top-level float
    columns carry NaN/NULL to the semantics-preserving RDD path,
    because pandas cannot distinguish the two (Arrow would turn NaN
    into NULL, and the no-Arrow path NULL into NaN)."""
    import math

    from blspark.ops import local_relation

    clean = spark.createDataFrame(
        [(1, [1.0, 2.0]), (0, [0.5, -1.0])], "id int, v array<double>"
    )
    out = local_relation(clean, "id int, v array<double>")
    assert "LocalTableScan" in (
        out._jdf.queryExecution().executedPlan().toString()
    )
    assert [tuple(r) for r in out.collect()] == [
        (0, [0.5, -1.0]),
        (1, [1.0, 2.0]),
    ]

    hazard = spark.createDataFrame(
        [(1, float("nan")), (2, None), (3, 1.5)], "id int, x double"
    )
    got = {
        r["id"]: r["x"]
        for r in local_relation(hazard, "id int, x double").collect()
    }
    assert math.isnan(got[1])
    assert got[2] is None
    assert got[3] == 1.5


def test_local_relation_rejects_corpus_sized_input(spark):
    """ops.local_relation is for metadata-sized frames only; the
    max_rows guard must fail fast on an oversized input (collecting at
    most max_rows + 1 rows, never the whole frame) instead of pulling
    a corpus onto the driver (r15 verdict item: the helper previously
    collected unconditionally)."""
    import pytest

    from blspark.ops import local_relation

    big = spark.range(0, 100).selectExpr("id", "cast(id as double) as x")
    with pytest.raises(ValueError, match="max_rows"):
        local_relation(big, "id bigint, x double", max_rows=10)
    # at exactly the bound it still works
    ok = local_relation(
        big.limit(10), "id bigint, x double", max_rows=10
    )
    assert ok.count() == 10
