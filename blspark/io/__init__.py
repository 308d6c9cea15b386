from blspark.io.readers import (
    read_json_records,
    read_padded_tsv,
    read_parquet_tables,
)
from blspark.io.manifest import file_manifest, newest_key

__all__ = [
    "read_padded_tsv",
    "read_json_records",
    "read_parquet_tables",
    "file_manifest",
    "newest_key",
]
