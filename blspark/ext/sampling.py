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

# Contract bound on integer weights: the key expression materializes
# ``w`` md5 draws PER ROW, so an unbounded weight is an unbounded
# per-row expression — and the DuckDB oracles replicate the draw set
# with a CONSTANT ``range(1, MAX_WEIGHT + 1)`` (DuckDB range() rejects
# lateral column arguments). Both engines clamp the weight to this ONE
# constant, so a weight-formula change that exceeds it clamps
# identically on both sides instead of silently diverging. Consumers
# deriving weights (queries/extensions10.ws_keyed_frame and its
# _ws_keyed_sql oracle prefix) import this constant — never restate 8.
MAX_WEIGHT = 8


def hashmin_key(
    df: DataFrame, id_col: str, weight_col: str, overflow: str = "clamp"
) -> DataFrame:
    """Append ``skey`` = min over ``j in 1..w`` of the 48-bit integer
    prefix of ``md5(id || ':' || j)``.

    ``weight_col`` is expected to be a positive integer column; NULL
    or sub-1 weights CLAMP to 1 (one draw) rather than propagate —
    ``sequence(1, 0)`` fabricates the descending range [1, 0] (an
    item that should never win would get TWO draws), and a NULL key
    sorts NULLS FIRST in Spark but last in DuckDB, so both hazards
    would silently corrupt the sample. Weights above ``MAX_WEIGHT``
    clamp down to it — the oracles replicate the draw set with a
    constant ``range(1, MAX_WEIGHT + 1)``, so the clamp keeps both
    engines on the identical draw set (see MAX_WEIGHT); pass
    ``overflow="error"`` to fail loudly on an out-of-contract weight
    instead of silently truncating its draw set. Error mode guards
    ONLY the truncating (``> MAX_WEIGHT``) side: null, zero, and
    negative weights still clamp UP to 1 in both modes — that clamp
    is a correctness guard (two-draw / NULL-ordering hazards above),
    not a draw-set truncation. The md5 is
    taken over the UTF-8 bytes of the ``id:j`` string via
    ``dedup.md5_prefix_int`` (the one md5-prefix device), so oracles
    replicate keys exactly.
    """
    from blspark.ext.dedup import md5_prefix_int

    if overflow not in ("clamp", "error"):
        raise ValueError(f"overflow must be 'clamp' or 'error': {overflow!r}")

    w_in = F.coalesce(F.col(weight_col).cast("int"), F.lit(1))
    if overflow == "error":
        # Out-of-contract surfacing: a weight above MAX_WEIGHT would
        # silently truncate the draw set (biased sample) under the
        # default clamp; this mode fails the job loudly instead.
        w_in = F.when(
            w_in > MAX_WEIGHT,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"hashmin_key: weight exceeds MAX_WEIGHT={MAX_WEIGHT}"
                        " (would clamp and bias the draw set); id="
                    ),
                    F.col(id_col).cast("string"),
                )
            ).cast("int"),
        ).otherwise(w_in)
    w = F.least(F.lit(MAX_WEIGHT), F.greatest(F.lit(1), w_in))

    def draw(j):
        return md5_prefix_int(
            F.concat_ws(
                ":", F.col(id_col).cast("string"), j.cast("string")
            ),
            _KEY_NIBBLES,
        )

    return df.withColumn(
        "skey",
        F.array_min(F.transform(F.sequence(F.lit(1), w), draw)),
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
