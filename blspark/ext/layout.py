"""Z-order (Morton) clustering keys for multi-dimensional data layout.

``write_layout_parquet`` (io/sinks.py) already gives single-key
clustering: sort by X and parquet row-group min/max stats prune X
predicates. But a sort on X leaves every row group spanning the full Y
domain — point/range filters on Y skip nothing. Interleaving the bits
of X and Y into one Morton key and sorting by THAT bounds each row
group in BOTH dimensions (each contiguous z-range is a small hyper-
rectangle of the (X, Y) space), which is how lakehouse OPTIMIZE
ZORDER BY makes multi-column skipping work at 100 TB.

The key is pure JVM-side integer arithmetic (shift/and/or terms,
whole-stage codegen) — no UDF, no shuffle; the only cost is the sort
already paid for clustering. ``ZORDER_BITS=16`` per dimension (32-bit
key) is enough to order ~65k distinct buckets per axis; inputs are
masked to the low 16 bits, so callers should pre-scale values into
[0, 65535] (rank/percentile or fixed-width bucketing) — standard for
z-order, which needs bounded non-negative coordinates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ZORDER_BITS = 16


def _spark_interleave(col: str, offset: int) -> str:
    """Spark SQL for spreading the low 16 bits of ``col`` onto even
    (offset=0) or odd (offset=1) bit positions of a 32-bit key."""
    return " + ".join(
        f"shiftleft(shiftright(CAST({col} AS BIGINT), {i}) & 1, {2 * i + offset})"
        for i in range(ZORDER_BITS)
    )


def _duck_interleave(col: str, offset: int) -> str:
    """The same bit-spread in DuckDB SQL (>> / & / << operators)."""
    return " + ".join(
        f"(((CAST({col} AS BIGINT) >> {i}) & 1) << {2 * i + offset})"
        for i in range(ZORDER_BITS)
    )


def zorder_sql(x: str, y: str, dialect: str = "spark") -> str:
    """SQL expression for the Morton interleave of ``x`` (even bits) and
    ``y`` (odd bits), both masked to 16 bits. Emitted for either engine
    so oracle queries can mirror the Spark computation exactly."""
    f = _spark_interleave if dialect == "spark" else _duck_interleave
    mx, my = f"({x}) % 65536", f"({y}) % 65536"
    return f"{f(mx, 0)} + {f(my, 1)}"


def zorder_key(x: str, y: str) -> Column:
    """Morton key Column for two non-negative int columns (low 16 bits
    each). Use as the ``sort_by`` column of ``write_layout_parquet`` to
    cluster files/row-groups in both dimensions at once."""
    return F.expr(zorder_sql(x, y, "spark")).cast("bigint")
