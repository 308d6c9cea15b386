"""Oracle-checked mirror-sync classification (SURVEY.md §2.3 J2-J4).

Builds the two manifests deterministically from the `documents` table so
the DuckDB oracle can reproduce them: remote = docs with doc_id % 7 != 0;
mirror = docs with doc_id % 5 != 0, where docs with doc_id % 3 == 0 have
drifted content (different checksum). The classification must then mark
insert/update/skip/delete exactly like the reference's three passes
(sync_and_fetch.py:135-196)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blspark.catalog import load_table, register
from blspark.sync import classify_mirror

SYNC_ORACLE = """
WITH remote AS (
  SELECT 'f' || CAST(doc_id AS VARCHAR) AS key, md5(text) AS md5
  FROM documents WHERE doc_id % 7 <> 0
), mirror AS (
  SELECT 'f' || CAST(doc_id AS VARCHAR) AS key,
         md5(CASE WHEN doc_id % 3 = 0 THEN text || 'drift' ELSE text END) AS md5
  FROM documents WHERE doc_id % 5 <> 0
)
SELECT COALESCE(r.key, m.key) AS key,
       r.md5 AS remote_md5,
       m.md5 AS mirror_md5,
       CASE WHEN m.md5 IS NULL THEN 'insert'
            WHEN r.md5 IS NULL THEN 'delete'
            WHEN r.md5 <> m.md5 THEN 'update'
            ELSE 'skip' END AS action
FROM remote r FULL OUTER JOIN mirror m ON r.key = m.key
"""


@register(
    "q_sync_classify",
    oracle=SYNC_ORACLE,
    doc="Full-mirror MERGE classification via one full-outer join on "
    "(key, checksum) manifests (J2/J3/J4). Ref sync_and_fetch.py:135-196.",
)
def q_sync_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = F.concat(F.lit("f"), F.col("doc_id").cast("string")).alias("key")
    remote = docs.filter(F.col("doc_id") % 7 != 0).select(
        key, F.md5(F.col("text").cast("binary")).alias("md5")
    )
    mirror = docs.filter(F.col("doc_id") % 5 != 0).select(
        key,
        F.md5(
            F.when(
                F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit("drift"))
            )
            .otherwise(F.col("text"))
            .cast("binary")
        ).alias("md5"),
    )
    return classify_mirror(remote, mirror)


@register(
    "q_sync_merge",
    oracle="""
    SELECT 'f' || CAST(doc_id AS VARCHAR) AS key, md5(text) AS md5
    FROM documents WHERE doc_id % 7 <> 0
    """,
    doc="MERGE INTO-shaped plan application (blspark.sync.merge_manifest): "
    "the classification plan from q_sync_classify applied to the mirror "
    "manifest in one full-outer join — WHEN MATCHED delete/update, WHEN "
    "NOT MATCHED insert. The oracle is the CONVERGENCE INVARIANT itself: "
    "the post-merge manifest must equal the remote manifest exactly "
    "(same key set, same checksums), which is what makes the mirror a "
    "mirror. Ref sync_and_fetch.py:135-196.",
)
def q_sync_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from blspark.sync import merge_manifest

    docs = load_table(spark, sf_dir, "documents")
    key = F.concat(F.lit("f"), F.col("doc_id").cast("string")).alias("key")
    remote = docs.filter(F.col("doc_id") % 7 != 0).select(
        key, F.md5(F.col("text").cast("binary")).alias("md5")
    )
    mirror = docs.filter(F.col("doc_id") % 5 != 0).select(
        key,
        F.md5(
            F.when(
                F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit("drift"))
            )
            .otherwise(F.col("text"))
            .cast("binary")
        ).alias("md5"),
    )
    plan = classify_mirror(remote, mirror)
    return merge_manifest(mirror, plan)
