"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``blspark.catalog`` — every operator from SURVEY.md §2
(and the extension scope) registers there with a Spark callable and,
where SQL-expressible, a DuckDB oracle twin. See blspark/queries/*.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# blspark lives next to this file; make the import independent of the
# caller's working directory
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q2 'best year per series' analog — grouped sum +
    per-group argmax window with earliest-year tie-break) on sf0.001."""
    from blspark.catalog import registry

    return registry()["q2_best_year"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from blspark.catalog import registry

    return {name: q.spark_fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query. Since round 5 EVERY registered
    query carries one — learned/engine-specific ops hash deterministic
    contract rows instead of raw outputs."""
    from blspark.catalog import registry

    return {name: q.oracle for name, q in registry().items() if q.oracle}
