#!/usr/bin/env python
"""Snapshot .explain("formatted") output for named queries into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence files
(judge checks plan claims against these).

Usage: python scripts/plan_snap.py <suffix> <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       PLAN_TAG (default r16)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blspark.catalog import registry  # noqa: E402
from blspark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("PLAN_TAG", "r16")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(root, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="blspark-plan-snap")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    reg = registry()
    for name in names:
        df = reg[name].spark_fn(spark, sf)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
