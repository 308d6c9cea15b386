"""``python -m blspark`` — the runnable surface, mirroring the
reference's deployed entry points (sync Lambda + report Lambda,
data_pipeline_stack.py:44,84) plus the query registry:

    python -m blspark list [--tag TAG]
    python -m blspark query q2_best_year [--sf-dir D] [--limit N] [--explain]
    python -m blspark oracle q2_best_year
    python -m blspark sync SRC_DIR_OR_URL MIRROR_DIR
    python -m blspark report DATA_DIR

Everything routes through the same library code the tests and driver
contract use; the CLI adds no logic of its own.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(app: str):
    from blspark.session import get_spark

    return get_spark(app_name=app)


def cmd_list(args) -> int:
    from blspark.catalog import registry

    for name, q in registry().items():
        if args.tag and args.tag not in q.tags:
            continue
        doc = " ".join((q.doc or "").split()).split(". ")[0][:100]
        mark = "bench " if q.bench else ""
        print(f"{name:38s} {mark}{doc}")
    return 0


def cmd_query(args) -> int:
    from blspark.catalog import registry

    reg = registry()
    if args.name not in reg:
        print(f"unknown query {args.name!r}; see `python -m blspark list`",
              file=sys.stderr)
        return 2
    spark = _spark(f"blspark-{args.name}")
    df = reg[args.name].spark_fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    return 0


def cmd_oracle(args) -> int:
    from blspark.catalog import registry

    reg = registry()
    if args.name not in reg or not reg[args.name].oracle:
        print(f"no oracle for {args.name!r}", file=sys.stderr)
        return 2
    print(reg[args.name].oracle)
    return 0


def cmd_sync(args) -> int:
    from blspark.jobs import sync_job

    spark = _spark("blspark-sync")
    counts = sync_job(spark, args.source, args.mirror_dir)
    print(json.dumps(counts))
    return 0


def cmd_report(args) -> int:
    from blspark.jobs import report_job

    spark = _spark("blspark-report")
    out = report_job(spark, args.data_dir)
    for name, df in out.items():
        print(f"== {name} ==")
        if df is None:
            print("(input missing — skipped)")
        else:
            df.show(args.limit, truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m blspark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("--tag", default=None)
    lp.set_defaults(fn=cmd_list)

    qp = sub.add_parser("query", help="run one registered query")
    qp.add_argument("name")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qp.add_argument("--limit", type=int, default=20)
    qp.add_argument("--explain", action="store_true")
    qp.set_defaults(fn=cmd_query)

    op = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    op.add_argument("name")
    op.set_defaults(fn=cmd_oracle)

    sp = sub.add_parser(
        "sync", help="mirror-sync a directory or HTML index URL (EP1)"
    )
    sp.add_argument("source")
    sp.add_argument("mirror_dir")
    sp.set_defaults(fn=cmd_sync)

    rp = sub.add_parser("report", help="run the BLS report pipeline (EP2)")
    rp.add_argument("data_dir")
    rp.add_argument("--limit", type=int, default=20)
    rp.set_defaults(fn=cmd_report)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
