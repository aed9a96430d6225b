"""True multi-threaded OCC writers (round 7): the disjoint-partition and
conflict-retry guarantees under REAL concurrency, not staged interleaving
— the operational claim upsert_occ's docstring makes, exercised with
threads sharing one SparkSession (Spark's supported multi-job model)."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import (
    CommitConflict,
    TimelineTable,
)


def _rows(spark, data):
    return spark.createDataFrame(
        [Row(k=k, part=p, v=v, ver=ver) for (k, p, v, ver) in data]
    )


def _state(t):
    return {r.k: (r.part, r.v, r.ver) for r in t.read().collect()}


@pytest.fixture
def table(spark, tmp_path):
    return TimelineTable(
        spark=spark, path=str(tmp_path / "occ"), keys=["k"],
        precombine="ver", partition_by=["part"],
    )


def test_threaded_disjoint_writers_all_commit(spark, table):
    table.upsert(_rows(spark, [(i, f"p{i}", "seed", 1) for i in range(4)]))
    base = table.last_commit()
    errs: list = []

    def writer(i: int):
        try:
            table.upsert_occ(
                _rows(spark, [(100 + i, f"p{i}", f"w{i}", 2)]), base=base
            )
        except Exception as e:  # noqa: BLE001 — collected for the assert
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert errs == []  # disjoint partitions: nobody conflicts
    assert table.last_commit() == base + 4
    got = _state(table)
    for i in range(4):
        assert got[100 + i] == (f"p{i}", f"w{i}", 2)
        assert got[i] == (f"p{i}", "seed", 1)


def test_threaded_same_partition_writers_serialize_via_retry(spark, table):
    table.upsert(_rows(spark, [(0, "hot", "seed", 1)]))
    conflicts = {"n": 0}
    errs: list = []
    lock = threading.Lock()

    def writer(i: int):
        for _attempt in range(10):
            base = table.last_commit()
            try:
                table.upsert_occ(
                    _rows(spark, [(200 + i, "hot", f"w{i}", 2)]), base=base
                )
                return
            except CommitConflict:
                with lock:
                    conflicts["n"] += 1
        errs.append(RuntimeError(f"writer {i} starved after 10 retries"))

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=600)
    assert errs == []
    got = _state(table)
    # every writer's row landed — no lost update, however the race played
    for i in range(4):
        assert got[200 + i] == ("hot", f"w{i}", 2), (i, conflicts["n"])
    assert got[0] == ("hot", "seed", 1)
    # commits: one per successful writer (conflicted attempts publish nothing)
    assert table.last_commit() == 1 + 4
