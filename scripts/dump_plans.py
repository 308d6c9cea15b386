#!/usr/bin/env python
"""Regenerate PLANS.md: the formatted physical plan of every bench
query at $SPARK_GRAFT_SF_DIR (default sf0.1) under the blspark session
defaults — the checkable evidence behind SCALE.md's plan-shape claims."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blspark.catalog import registry  # noqa: E402
from blspark.session import get_spark  # noqa: E402


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="blspark-plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    out = [
        "# PLANS — formatted physical plans of the bench queries",
        "",
        "Auto-generated (`python scripts/dump_plans.py`) from the live",
        "registry at sf0.1 under pyspark 4.1.2 with the blspark session",
        "defaults — the evidence behind SCALE.md's plan-shape claims.",
        "",
    ]
    for name, q in sorted(registry().items()):
        if not q.bench:
            continue
        df = q.spark_fn(spark, sf)
        plan = df._jdf.queryExecution().explainString(mode)
        kept = [
            line
            for line in plan.splitlines()
            if not line.startswith("Input ")
        ]
        out += [f"## {name}", "", "```", *kept, "```", ""]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
