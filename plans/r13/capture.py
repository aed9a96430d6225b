#!/usr/bin/env python
"""r13 optimization-round measurement harness (guide §1).

For each headline query (or names passed on argv):
  - build_s:  wall time of fn(spark, SF_DIR) — Python plan construction
  - noop_s:   min-of-3 wall of df.write.format("noop") after 2 warmups —
              computation only, no sink, no count()-style column pruning
  - plan:     explain("formatted") written to plans/r13/<name>_<tag>.txt

Usage: python plans/r13/capture.py <tag> [query ...]
Writes plans/r13/<name>_<tag>.txt and prints one timing line per query.
Session/env identical to bench.py (same get_spark, same SF dir).
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from aws_glue_streaming_etl_with_apache_hudi_spark import get_spark  # noqa: E402
from aws_glue_streaming_etl_with_apache_hudi_spark.plans import explain_str  # noqa: E402
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or sorted(n for n, q in QUERIES.items() if q.headline)
    spark = get_spark(app_name=f"plan-capture-{tag}")
    rows = []
    for name in names:
        fn = QUERIES[name].fn
        spark.sparkContext.setJobDescription(f"{name} [{tag}]")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        build_s = time.perf_counter() - t0
        for _ in range(2):  # warmups (JIT, parquet footers, operator caches)
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        noop_s = min(runs)
        plan = explain_str(df)
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        n_exch = plan.count("Exchange")
        n_py = sum(plan.count(k) for k in
                   ("BatchEvalPython", "ArrowEvalPython", "MapInArrow",
                    "MapInPandas", "FlatMapGroupsInPandas", "PythonUDTF"))
        rows.append((name, build_s, noop_s, n_exch, n_py))
        print(f"{name:30s} build={build_s:6.3f}s noop_min={noop_s:6.3f}s "
              f"exchanges={n_exch} python_nodes={n_py}", flush=True)
    total_build = sum(r[1] for r in rows)
    total_noop = sum(r[2] for r in rows)
    print(f"TOTAL{'':26s} build={total_build:6.3f}s noop_min={total_noop:6.3f}s")


if __name__ == "__main__":
    main()
