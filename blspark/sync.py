"""Mirror synchronization — MERGE semantics over (key, checksum) manifests.

The reference syncs a remote HTTP directory into S3 with three passes
(upload new, re-upload changed via MD5-vs-ETag, delete removed —
sync_and_fetch.py:135-196, SURVEY.md §2.3 J2-J4). Spark-first, that is
ONE full-outer join on `key` classifying every row:

    insert  — key only on remote
    update  — key on both, checksum differs
    skip    — key on both, checksum equal
    delete  — key only in the mirror

At 100 TB scale both manifests are DataFrames (millions of keys is
nothing); the join broadcasts if one side is small, else shuffles once
on `key`. The per-file byte copy is executor-side work driven by the
plan (`foreachPartition`), never a driver loop.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACTIONS = ("insert", "update", "skip", "delete")


def classify_mirror(remote: DataFrame, mirror: DataFrame) -> DataFrame:
    """Classify sync actions from two manifests.

    ``remote``: (key, md5) — source of truth (the reference's scraped
    listing + streamed MD5, sync_and_fetch.py:49-115).
    ``mirror``: (key, md5) — current mirror state (the reference's
    ``{key: etag}`` dict, sync_and_fetch.py:84-93).

    Returns (key, remote_md5, mirror_md5, action).
    """
    r = remote.select(F.col("key"), F.col("md5").alias("remote_md5"))
    m = mirror.select(F.col("key"), F.col("md5").alias("mirror_md5"))
    joined = r.join(m, on="key", how="full_outer")
    action = (
        F.when(F.col("mirror_md5").isNull(), F.lit("insert"))
        .when(F.col("remote_md5").isNull(), F.lit("delete"))
        .when(F.col("remote_md5") != F.col("mirror_md5"), F.lit("update"))
        .otherwise(F.lit("skip"))
    )
    return joined.withColumn("action", action)


def merge_manifest(mirror: DataFrame, plan: DataFrame) -> DataFrame:
    """Apply a classification plan to the mirror MANIFEST as one
    MERGE INTO-shaped expression — the declarative twin of the
    file-copying ``apply_mirror_local``:

        MERGE INTO mirror m USING plan p ON m.key = p.key
          WHEN MATCHED AND p.action = 'delete' THEN DELETE
          WHEN MATCHED AND p.action = 'update' THEN UPDATE SET md5 = p.remote_md5
          WHEN NOT MATCHED AND p.action = 'insert' THEN INSERT (key, md5)

    Spark's MERGE INTO statement needs a v2/lakehouse table provider
    (Delta/Iceberg); over plain manifests the same semantics are ONE
    full-outer join — this form, not the SQL statement, is the
    canonical engine-native MERGE here. Returns the post-merge manifest
    (key, md5). Convergence invariant (tested): merging the plan
    produced by ``classify_mirror(remote, mirror)`` yields exactly
    ``remote``."""
    p = plan.select("key", "remote_md5", "action")
    m = mirror.select("key", F.col("md5").alias("mirror_md5"))
    j = m.join(p, on="key", how="full_outer")
    return (
        j.filter(F.col("action").isNull() | (F.col("action") != "delete"))
        .select(
            "key",
            F.when(
                F.col("action").isin("insert", "update"), F.col("remote_md5")
            )
            .otherwise(F.col("mirror_md5"))
            .alias("md5"),
        )
    )


def apply_mirror_local(plan: DataFrame, src_dir: str, dst_dir: str) -> dict[str, int]:
    """Apply a classification plan between two local directories (the
    testable stand-in for the reference's HTTP→S3 copy). Copies happen
    per-partition on executors; only counts return to the driver."""

    os.makedirs(dst_dir, exist_ok=True)

    def apply_partition(rows):
        for row in rows:
            src = os.path.join(src_dir, row["key"])
            dst = os.path.join(dst_dir, row["key"])
            if row["action"] in ("insert", "update"):
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copyfile(src, dst)
            elif row["action"] == "delete" and os.path.exists(dst):
                os.remove(dst)

    # Materialize the plan BEFORE mutating the mirror: the classification
    # scans the very files the apply step deletes/overwrites, so lazy
    # re-execution after apply would re-read missing files. The persisted
    # plan is compact — (key, md5, action) only, never file bodies.
    plan = plan.persist()
    try:
        counts = {
            r["action"]: r["n"]
            for r in plan.groupBy("action").agg(F.count("*").alias("n")).collect()
        }
        plan.filter(F.col("action") != "skip").foreachPartition(apply_partition)
    finally:
        plan.unpersist()
    return {a: counts.get(a, 0) for a in ACTIONS}
