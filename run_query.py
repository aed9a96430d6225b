#!/usr/bin/env python
"""Run any registered query from the command line.

  python run_query.py q1_pricing_summary
  python run_query.py knn_filtered --sf-dir /root/testdata/sf0.01 --limit 10
  python run_query.py --list                 # all query names
  python run_query.py table_profile --explain  # formatted physical plan

The batch-query counterpart of run_pipeline.py: together they cover the
two ways a reference user touches the engine (stream a table in, query
it out).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--limit", type=int, default=20, help="rows to show (0 = count only)")
    ap.add_argument("--explain", action="store_true", help="print the physical plan instead of rows")
    ap.add_argument("--list", action="store_true", help="list registered query names")
    args = ap.parse_args(argv)

    from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES

    if args.list or not args.name:
        for n, q in QUERIES.items():
            tag = "headline" if q.headline else ("oracle" if q.sql else "rows-only")
            print(f"{n}\t{tag}")
        return 0
    if args.name not in QUERIES:
        import difflib

        near = difflib.get_close_matches(args.name, QUERIES, n=3)
        print(f"unknown query: {args.name}" + (f" (did you mean: {', '.join(near)}?)" if near else ""))
        return 2

    from aws_glue_streaming_etl_with_apache_hudi_spark import get_spark

    spark = get_spark(app_name=f"run-query-{args.name}")
    df = QUERIES[args.name].fn(spark, args.sf_dir)
    if args.explain:
        # plan only — no execution (the point of asking for the plan)
        from aws_glue_streaming_etl_with_apache_hudi_spark.plans import explain_str

        print(explain_str(df))
    elif args.limit > 0:
        # one job: show() materializes limit+1 rows, no second full count
        df.show(args.limit, truncate=False)
        print(f"{args.name}: first {args.limit} rows @ {args.sf_dir}")
    else:
        print(f"{args.name}: {df.count()} rows @ {args.sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
