"""Two CONCURRENT sessions registering the same sf_dir's layout
tables must both complete: the per-process table names make their
warehouse dirs disjoint (no mid-FileScanRDD crash from a concurrent
drop-and-purge), and the orphan-GC sweep reclaims dirs whose owning
process has exited. Each subprocess is a fresh JVM with its own
vanilla SparkSession sharing the SAME spark-warehouse directory —
exactly the "pytest -n / second notebook" shape the stable names
used to break under."""

from __future__ import annotations

import os
import subprocess
import sys
import time

from tests.conftest import SF_ORACLE

_CHILD = """
import sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
from blspark.catalog import registry

REG = registry()
sf = sys.argv[1]
n_join = REG["x_bucketed_colocated_join"].spark_fn(spark, sf).count()
n_scan = REG["x_partitioned_prune_scan"].spark_fn(spark, sf).count()
assert n_join > 0 and n_scan > 0, (n_join, n_scan)
print("CHILD_OK", n_join, n_scan)
"""


def test_two_concurrent_sessions_share_warehouse(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd()
    procs = []
    for i in range(2):
        p = subprocess.Popen(
            [sys.executable, "-c", _CHILD, SF_ORACLE],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=os.getcwd(),
            text=True,
        )
        procs.append(p)
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out}\n{err[-3000:]}"
        assert "CHILD_OK" in out


def test_orphan_gc_reclaims_dead_pid_dirs(spark):
    """A layout dir tagged with a dead pid is removed by the GC sweep;
    one tagged with a LIVE pid (ours) is left alone."""
    import hashlib
    import urllib.parse

    from blspark.queries.extensions10 import (
        _gc_orphan_layout_dirs,
        _pid_alive,
    )

    wpath = urllib.parse.urlparse(
        spark.conf.get("spark.sql.warehouse.dir")
    ).path
    os.makedirs(wpath, exist_ok=True)
    tag = hashlib.md5(b"gc-test").hexdigest()[:10]
    # pid 1 is init (alive, not ours); find a dead pid deterministically
    dead = 99999
    while _pid_alive(dead):
        dead -= 1
    dead_dir = os.path.join(wpath, f"blspark_bkt_orders_{tag}_p{dead}")
    live_dir = os.path.join(
        wpath, f"blspark_bkt_orders_{tag}_p{os.getpid()}"
    )
    # pre-pid stable-name scheme: no owner concept, but reclaimed only
    # once STALE (mtime > 1h) so a concurrent session still running the
    # old code version is not raced mid-scan
    legacy_dir = os.path.join(wpath, f"blspark_bkt_orders_{tag}")
    os.makedirs(dead_dir, exist_ok=True)
    os.makedirs(live_dir, exist_ok=True)
    os.makedirs(legacy_dir, exist_ok=True)
    try:
        _gc_orphan_layout_dirs(spark, ("blspark_bkt_orders",), tag)
        assert not os.path.isdir(dead_dir)
        # fresh legacy dir: could still be in use by an old-version
        # session — survives the sweep
        assert os.path.isdir(legacy_dir)
        assert os.path.isdir(live_dir)
        # age it past the 1h gate: now it is an orphan and is drained
        old = time.time() - 2 * 3600
        os.utime(legacy_dir, (old, old))
        _gc_orphan_layout_dirs(spark, ("blspark_bkt_orders",), tag)
        assert not os.path.isdir(legacy_dir)
        assert os.path.isdir(live_dir)
    finally:
        for d in (dead_dir, live_dir, legacy_dir):
            if os.path.isdir(d):
                os.rmdir(d)
