#!/usr/bin/env python
"""Registry-wide plan audit (guide §7.2), committed for reproducibility.

For every registered query, build the plan at the given SF and count:
  - Scan parquet occurrences per base table file (the duplicate-subtree
    smell: >2 mentions of one file usually means a multi-consumer branch
    re-executing its upstream; AQE's "Initial Plan" re-print accounts
    for exactly 2x in simple plans)
  - Exchange mentions (text-level; InMemoryRelation consumers re-print
    cached lineage, so treat as a smell indicator, not a real count)
  - Python eval nodes (BatchEvalPython/ArrowEvalPython/MapInArrow/...)
  - CartesianProduct / BroadcastNestedLoopJoin occurrences

Usage: python plans/r13/audit.py [sf_dir] > /tmp/audit.tsv
"""
from __future__ import annotations

import os
import re
import sys
import time
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from aws_glue_streaming_etl_with_apache_hudi_spark import get_spark  # noqa: E402
from aws_glue_streaming_etl_with_apache_hudi_spark.plans import explain_str  # noqa: E402
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

PY_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "PythonUDTF",
)


def main() -> None:
    spark = get_spark(app_name="plan-audit")
    print("query\tbuild_s\texchanges\tpy_nodes\tcartesian\tbnlj\tmax_scan\tscans_per_file")
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        try:
            plan = explain_str(QUERIES[name].fn(spark, SF_DIR))
        except Exception as exc:  # surface, keep auditing
            print(f"{name}\tERROR\t{type(exc).__name__}: {exc}")
            continue
        build_s = time.perf_counter() - t0
        scans = Counter(
            os.path.basename(m)
            for m in re.findall(r"InMemoryFileIndex \[[^\]]*?([^/\[\]]+\.parquet)", plan)
        )
        top = ",".join(f"{f}:{n}" for f, n in scans.most_common(4))
        print(
            f"{name}\t{build_s:.2f}\t{plan.count('Exchange')}\t"
            f"{sum(plan.count(k) for k in PY_NODES)}\t"
            f"{plan.count('CartesianProduct')}\t"
            f"{plan.count('BroadcastNestedLoopJoin')}\t"
            f"{max(scans.values(), default=0)}\t{top}",
            flush=True,
        )


if __name__ == "__main__":
    main()
