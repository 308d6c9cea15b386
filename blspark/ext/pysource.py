"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API).

The reference's non-file sources (HTML directory listings, REST JSON —
SURVEY §2.1 S1/S6) are mapped in `io/ingest.py` to driver-side parsers
feeding `createDataFrame`. The Spark-4-native way to expose such a
source to ANY reader is a registered Python DataSource: the planner
asks it for partitions, and each partition's rows are produced INSIDE
an executor Python worker — so a million-entry remote listing or a
paginated REST API fans out across the cluster instead of serializing
on the driver (same motivation as `stage_remote_distributed`, but as a
first-class `spark.read.format(...)` surface with schema, options, and
partition planning).

`ManifestDataSource` here is the deterministic reference instance: it
synthesizes a file-manifest-shaped table (key, size_bytes, checksum)
from `n` and `parts` options, split into `parts` input partitions.
The row payload is hash-derived (md5 of the key) so any count/schema/
value can be oracle-checked; a real fetcher would swap the synthesis
loop for an HTTP call using the same partition-planning skeleton.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class ManifestReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 100))
        self.parts = int(options.get("parts", 4))

    def partitions(self):
        step = max(1, -(-self.n // self.parts))
        return [
            _RangePartition(i, min(i + step, self.n))
            for i in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        # runs in an executor Python worker, one call per partition
        for i in range(partition.start, partition.end):
            key = f"file_{i:06d}.dat"
            digest = hashlib.md5(key.encode()).hexdigest()
            # deterministic pseudo-size from the first 4 hex digits
            size = int(digest[:4], 16)
            yield (key, size, digest)


class ManifestDataSource(DataSource):
    """`spark.read.format("blspark_manifest").option("n", ...)`."""

    @classmethod
    def name(cls) -> str:
        return "blspark_manifest"

    def schema(self) -> str:
        return "key string, size_bytes bigint, checksum string"

    def reader(self, schema) -> ManifestReader:
        return ManifestReader(self.options)


def register_manifest_source(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    spark.dataSource.register(ManifestDataSource)
