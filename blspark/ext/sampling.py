"""Exact weighted sampling without replacement via hash-min
replication.

The device: give item ``i`` with integer weight ``w_i`` the key

    key_i = min_{j in 1..w_i} H(id_i, j)

where ``H`` is a fixed 48-bit uniform hash (the first 12 hex nibbles
of md5, the repo's shared deterministic-hash idiom — ext/dedup
``hex_int_sql`` / ``md5_bucket``). All ``sum(w)`` draws are iid
uniforms, so the item holding the GLOBAL minimum is item ``i`` with
probability exactly ``w_i / sum(w)``; peeling winners off in key
order yields successive weighted draws without replacement (each
remaining item again wins with probability proportional to its
weight among the remainder). This is A-ES (Efraimidis–Spirakis
``u^(1/w)`` sampling) restricted to integer weights — restated as a
min over ``w`` draws so the whole computation stays in exact integer
compares: no ``pow``/``log`` (transcendental last-ulp divergence
between engines is the reason — see catalog numeric policy), no RNG
state, reproducible across runs, engines, and partitionings.

Scale shape: the key is ONE inline map-side expression per row
(``transform`` over ``sequence(1, w)`` — w is small and bounded by
contract), and top-``n`` by key plans as TakeOrderedAndProject
(per-partition partial top-n, then a single metadata-sized merge) —
no shuffle, no window, no corpus-sized sort at any data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 12 hex nibbles = 48 bits: collision odds across 10^7 draws ~ 2e-4,
# and any collision is still deterministic (consumers tie-break by id)
_KEY_NIBBLES = 12


def hashmin_key(df: DataFrame, id_col: str, weight_col: str) -> DataFrame:
    """Append ``skey`` = min over ``j in 1..w`` of the 48-bit integer
    prefix of ``md5(id || ':' || j)``.

    ``weight_col`` must be a POSITIVE integer column (callers clamp:
    ``sequence(1, w)`` with w < 1 fabricates a descending range —
    catalog numeric-policy gotcha). The md5 is taken over the UTF-8
    bytes of the ``id:j`` string, matching DuckDB ``md5(varchar)``
    (the ``md5_bucket`` device), so oracles replicate keys exactly.
    """

    def draw(j):
        h = F.md5(
            F.concat_ws(
                ":", F.col(id_col).cast("string"), j.cast("string")
            ).cast("binary")
        )
        return F.conv(F.substring(h, 1, _KEY_NIBBLES), 16, 10).cast("long")

    return df.withColumn(
        "skey",
        F.array_min(
            F.transform(
                F.sequence(F.lit(1), F.col(weight_col).cast("int")), draw
            )
        ),
    )


def weighted_topn(
    df: DataFrame, id_col: str, weight_col: str, n: int
) -> DataFrame:
    """The ``n`` weighted-sample winners: smallest ``skey`` first,
    id tie-break. Input columns pass through with ``skey`` appended."""
    return (
        hashmin_key(df, id_col, weight_col)
        .orderBy(F.asc("skey"), F.asc(id_col))
        .limit(n)
    )
