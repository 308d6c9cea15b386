"""Bloom-filter join pruning for semi-join shapes.

Two tiers, both scale paths for "prune a huge fact table by a key set":

1. **Catalyst runtime bloom filters** (preferred, zero code): Spark's
   ``InjectRuntimeFilter`` rule plants ``bloom_filter_agg`` /
   ``might_contain`` automatically on shuffle joins whose creation side
   has a selective filter (``spark.sql.optimizer.runtime.bloomFilter.*``,
   enabled in :mod:`blspark.session`). ``tests/test_bloom.py`` asserts
   the injection on the TPC-H orders⋈lineitem shape.

2. **Explicit ``bloom_prune``** (this module): for when the key side is
   too large to broadcast as a hash relation but its Bloom bitset is not
   — e.g. pruning a 100 TB fact by 10^8 dim keys: a broadcast hash
   relation needs tens of GB, the 10-bits/key bitset ~125 MB. The bitset
   is built DISTRIBUTED (per-key bit positions via JVM ``xxhash64``,
   OR-folded with one tiny ``bit_or`` aggregation — only (word, bits)
   pairs shuffle), then shipped to executors as a numpy broadcast
   variable; the probe computes positions JVM-side (same xxhash64 —
   build/probe hash parity by construction) and tests membership in an
   Arrow-batched pandas UDF.

False-positive semantics: ``bloom_prune`` may KEEP a row whose key is
absent (at ~``fp_rate``) and never drops a present key. Use it as a
pre-filter in front of an exact join, like Spark's own runtime filter.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(n_keys: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """Optimal (n_bits, n_hashes) for ``n_keys`` at ``fp_rate``:
    m = -n ln p / (ln 2)^2, k = (m/n) ln 2 — rounded, floor 64 bits /
    1 hash."""
    n_keys = max(n_keys, 1)
    m = int(-n_keys * math.log(fp_rate) / (math.log(2) ** 2))
    m = max(64, (m + 63) // 64 * 64)
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def _positions(key: Column, n_bits: int, n_hashes: int) -> Column:
    """The k Bloom bit positions of a key, as array<long>. JVM-side
    xxhash64 with seed i — identical on build and probe sides."""
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits))
            for i in range(n_hashes)
        ]
    )


def build_bloom(
    keys: DataFrame, key_col: str, n_bits: int, n_hashes: int
) -> np.ndarray:
    """Distributed Bloom build: explode each key to its k bit positions,
    fold into 64-bit words with one ``bit_or`` aggregation. Only
    (word_idx, word) pairs — at most n_bits/64 rows — ever shuffle or
    reach the driver, regardless of key count."""
    pos = F.explode(_positions(F.col(key_col), n_bits, n_hashes)).alias("p")
    words = (
        keys.select(pos)
        .select(
            F.expr("p div 64").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )
    arr = np.zeros(n_bits // 64, dtype=np.int64)
    for r in words.collect():
        arr[r["w"]] = r["bits"]
    return arr


def bloom_prune(
    df: DataFrame,
    keys: DataFrame,
    df_key: str,
    keys_key: str | None = None,
    n_keys: int | None = None,
    fp_rate: float = 0.01,
) -> DataFrame:
    """Keep only ``df`` rows whose ``df_key`` might be in ``keys``
    (Bloom membership: no false negatives, ~``fp_rate`` false
    positives). ``n_keys`` sizes the filter; if omitted, one count job
    on the key side determines it.

    Scale shape: the fact side never shuffles — positions are computed
    in the scan stage and membership is one Arrow-batched numpy gather
    per batch against the broadcast bitset."""
    keys_key = keys_key or df_key
    if n_keys is None:
        n_keys = keys.select(keys_key).distinct().count()
    n_bits, n_hashes = bloom_params(n_keys, fp_rate)
    bits = build_bloom(keys, keys_key, n_bits, n_hashes)

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bits)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _might_contain(pos_lists: pd.Series) -> pd.Series:
        arr = bc.value
        out = np.empty(len(pos_lists), dtype=bool)
        for i, ps in enumerate(pos_lists):
            ok = True
            for p in ps:
                if not (arr[p >> 6] >> (p & 63)) & 1:
                    ok = False
                    break
            out[i] = ok
        return pd.Series(out)

    pos = _positions(F.col(df_key), n_bits, n_hashes)
    return (
        df.withColumn("__bloom_pos", pos)
        .filter(_might_contain(F.col("__bloom_pos")))
        .drop("__bloom_pos")
    )
