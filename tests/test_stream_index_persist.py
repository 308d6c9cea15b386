"""Physical claims of s_stream_index_persist: streamed arrivals land
as partition-local appends in the persisted cell-partitioned index
table, and the compaction pass reduces the accumulated per-batch
small files to one file per cell without changing content. (The
content parity against a full batch rebuild is the registered
query's hash-checked DuckDB oracle; these tests pin what the oracle
cannot see — the file layout.)"""

from __future__ import annotations

import glob
import os
import urllib.parse

from pyspark.sql import functions as F

from blspark.queries.streaming_q import (
    _SIDX_NEW,
    streamed_sq8_index_tables,
)
from tests.conftest import SF_SMOKE


def _table_dir(spark, name: str) -> str:
    wpath = urllib.parse.urlparse(
        spark.conf.get("spark.sql.warehouse.dir")
    ).path
    return os.path.join(wpath, name)


def _cell_files(spark, name: str) -> dict[str, int]:
    """parquet file count per cell_id=... partition directory."""
    root = _table_dir(spark, name)
    out: dict[str, int] = {}
    for d in sorted(glob.glob(os.path.join(root, "cell_id=*"))):
        out[os.path.basename(d)] = len(
            [
                f
                for f in os.listdir(d)
                if f.endswith(".parquet") and not f.startswith(".")
            ]
        )
    return out


def test_stream_index_persist_layout_and_content(spark):
    raw, compact = streamed_sq8_index_tables(spark, SF_SMOKE)

    raw_rows = {
        (r["vid"], r["cell_id"], tuple(r["qvec"]), r["scale"])
        for r in spark.table(raw).collect()
    }
    cmp_rows = {
        (r["vid"], r["cell_id"], tuple(r["qvec"]), r["scale"])
        for r in spark.table(compact).collect()
    }
    # compaction must never change content
    assert raw_rows == cmp_rows
    # the streamed arrivals are IN the persisted index
    arrived = {v for v, *_ in cmp_rows if v < _SIDX_NEW}
    n_arrivals = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .filter(F.col("vec_id") < _SIDX_NEW)
        .count()
    )
    assert len(arrived) == n_arrivals > 0

    raw_files = _cell_files(spark, raw)
    cmp_files = _cell_files(spark, compact)
    # both layouts cover exactly the table's cells (partition-local:
    # every file lives under a cell directory by construction)
    cells = {f"cell_id={c}" for (_, c, _, _) in cmp_rows}
    assert set(raw_files) == set(cmp_files) == cells
    # compacted: exactly ONE file per cell directory
    assert all(n == 1 for n in cmp_files.values()), cmp_files
    # the appends created extra small files somewhere — compaction
    # strictly reduced the total file count
    assert sum(raw_files.values()) > sum(cmp_files.values())


def test_stream_index_persist_registered_output_matches_tables(spark):
    """The registered query's exploded output is exactly the
    compacted table content (one row per vector position)."""
    from blspark.catalog import registry

    q = registry()["s_stream_index_persist"]
    out = q.spark_fn(spark, SF_SMOKE)
    n_vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    rows = out.collect()
    assert len(rows) == n_vecs * 64
    assert {r["pos"] for r in rows[:200]} <= set(range(64))
