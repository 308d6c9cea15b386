"""Width-hazard lint for DuckDB oracle SQL — import-light (no pyspark).

DuckDB result types that materialize differently through the driver's
fetchdf()/Arrow path than through cursor fetchall(): HUGEINT (int128,
from SUM over INTEGER/BIGINT) becomes float64/decimal128, so the driver
value-hash diverges even when every number matches Spark's BIGINT, and
DECIMAL columns materialize as decimal128 rather than float64.
Python-level str() canonicalization is width-blind, which is exactly why
plain value diffing could not see the r5 failure class — hence this
explicit type lint on every oracle (VERDICT r5 item 2).

Shared by scripts/diffcheck.py and tests/test_oracle.py; lives in its own
module so the duck-only registry lint does not pay (or require) the
pyspark import (ADVICE r6 item 1).
"""

import re

# Search anywhere in the DESCRIBE type string, not just the prefix:
# DESCRIBE prints composites as STRUCT(a HUGEINT) / MAP(VARCHAR,
# DECIMAL(18,3)) / DECIMAL(18,3)[], and a nested width-unstable type is
# just as hash-hazardous as a top-level one (ADVICE r6 item 2).
_WIDTH_HAZARD = re.compile(r"\b(U?HUGEINT|DECIMAL)\b")


def width_hazards(con, oracle_sql: str) -> list[tuple[str, str]]:
    """Columns of the oracle result whose DuckDB type would materialize
    width-unstably through the driver's fetchdf()/Arrow path — including
    types nested inside STRUCT/MAP/LIST composites."""
    rows = con.execute(f"DESCRIBE {oracle_sql}").fetchall()
    return [(r[0], r[1]) for r in rows if _WIDTH_HAZARD.search(r[1])]
