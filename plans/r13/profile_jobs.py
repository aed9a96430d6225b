#!/usr/bin/env python
"""Per-job profile of headline queries (guide §1): event-log-backed.

For each query named on argv (default: the heaviest headliners), runs
2 warmups + 1 timed pass with the Spark event log enabled, then parses
the event log for that pass's jobs: per-job wall, task count, shuffle
read/write bytes. Shows where a query's wall goes — scheduler floors
(many tiny jobs) vs real shuffle work.

Usage: python plans/r13/profile_jobs.py [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

EVDIR = "/tmp/r13_eventlog"
os.makedirs(EVDIR, exist_ok=True)

from aws_glue_streaming_etl_with_apache_hudi_spark import get_spark  # noqa: E402
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEAVIES = [
    "knn_rerank", "q5_local_supplier_volume", "knn_lsh", "q9_product_profit",
    "text_tfidf_top_term", "corpus_build_pipeline", "q3_shipping_priority",
    "knn_bruteforce", "dedup_minhash_lsh", "sessionize_events",
    "join_inner_revenue",
]


def main() -> None:
    names = sys.argv[1:] or HEAVIES
    spark = get_spark(
        app_name="profile-jobs",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVDIR}",
        },
    )
    marks: dict[str, tuple[float, float]] = {}
    for name in names:
        fn = QUERIES[name].fn
        for _ in range(2):
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.sparkContext.setJobDescription(f"PROFILE:{name}")
        t0 = time.time()
        tp0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - tp0
        marks[name] = (t0 * 1000, time.time() * 1000)
        print(f"=== {name}: timed-pass wall {wall:.3f}s", flush=True)
    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1.0)

    path = os.path.join(EVDIR, app_id)
    if not os.path.exists(path):  # Spark 4 rolling event log layout
        d = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
        parts = sorted(
            os.path.join(d, p) for p in os.listdir(d) if p.startswith("events_")
        )
    else:
        parts = [path]
    jobs: dict[int, dict] = {}
    stage_of_job: dict[int, list[int]] = {}
    stages: dict[int, dict] = {}
    def _lines():
        for p in parts:
            if p.endswith(".zstd"):
                import subprocess
                out = subprocess.run(["zstdcat", p], capture_output=True, text=True)
                yield from out.stdout.splitlines()
            else:
                with open(p) as f:
                    yield from f
    if True:  # keep the original loop indentation
        for line in _lines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                }
                stage_of_job[jid] = [s["Stage ID"] for s in ev.get("Stage Infos", [])]
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                agg = stages.setdefault(si["Stage ID"], {})
                agg["tasks"] = si.get("Number of Tasks", 0)
                agg["name"] = si.get("Stage Name", "")
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                acc = {a["Name"]: a.get("Update", 0)
                       for a in (ev.get("Task Info") or {}).get("Accumulables", [])
                       if str(a.get("Name", "")).startswith("internal.metrics.")}
                g = lambda n: acc.get(f"internal.metrics.{n}", 0)
                agg = stages.setdefault(sid, {})
                agg["run_ms"] = agg.get("run_ms", 0) + g("executorRunTime")
                agg["cpu_ms"] = agg.get("cpu_ms", 0) + g("executorCpuTime") // 1_000_000
                agg["gc_ms"] = agg.get("gc_ms", 0) + g("jvmGCTime")
                agg["deser_ms"] = agg.get("deser_ms", 0) + g("executorDeserializeTime")
                agg["max_run_ms"] = max(agg.get("max_run_ms", 0), g("executorRunTime"))
                agg["sh_read_mb"] = agg.get("sh_read_mb", 0) + (
                    g("shuffle.read.localBytesRead") + g("shuffle.read.remoteBytesRead")) / 1e6
                agg["sh_write_mb"] = agg.get("sh_write_mb", 0) + g("shuffle.write.bytesWritten") / 1e6
                agg["input_mb"] = agg.get("input_mb", 0) + g("input.bytesRead") / 1e6

    for name in names:
        lo, hi = marks[name]
        mine = [
            (jid, j) for jid, j in sorted(jobs.items())
            if j.get("desc") == f"PROFILE:{name}"
            and lo - 50 <= j["start"] <= hi + 50
        ]
        total = sum(j.get("end", j["start"]) - j["start"] for _, j in mine)
        print(f"\n### {name}: {len(mine)} jobs, sum {total/1000:.3f}s")
        for jid, j in mine:
            dur = (j.get("end", j["start"]) - j["start"]) / 1000
            sids = stage_of_job.get(jid, [])
            ts = [stages.get(s, {}) for s in sids]
            tasks = sum(t.get("tasks", 0) for t in ts if t)
            run = sum(t.get("run_ms", 0) for t in ts)
            cpu = sum(t.get("cpu_ms", 0) for t in ts)
            gc = sum(t.get("gc_ms", 0) for t in ts)
            mx = max((t.get("max_run_ms", 0) for t in ts), default=0)
            srd = sum(t.get("sh_read_mb", 0) for t in ts)
            swr = sum(t.get("sh_write_mb", 0) for t in ts)
            inp = sum(t.get("input_mb", 0) for t in ts)
            print(f"  job {jid:4d}  {dur:7.3f}s  stages={len(sids)} "
                  f"tasks={tasks:4d} run={run/1000:6.2f}s cpu={cpu/1000:6.2f}s "
                  f"gc={gc/1000:5.2f}s maxtask={mx/1000:5.2f}s "
                  f"in={inp:6.1f}MB shr={srd:5.1f}MB shw={swr:5.1f}MB")


if __name__ == "__main__":
    main()
