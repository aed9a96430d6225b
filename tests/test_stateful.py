"""Golden test for the custom stateful operator (applyInPandasWithState):
state persists across micro-batches and resumes deterministically."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import EVENTS_SCHEMA
from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.stateful import running_user_totals


def _mk(spark, rows):
    from datetime import datetime

    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=datetime(2024, 1, 1, 0, i),
                user_id=uid,
                event_type="e",
                value=v,
                props="{}",
            )
            for i, (uid, v) in enumerate(rows)
        ],
        schema=EVENTS_SCHEMA,
    )


def test_running_totals_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)

    def drop(i, df):
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/_s{i}")
        (part,) = glob.glob(f"{src}/_s{i}/*.parquet")
        shutil.move(part, f"{src}/b{i}.parquet")
        shutil.rmtree(f"{src}/_s{i}")

    drop(0, _mk(spark, [(1, 10.0), (1, 5.0), (2, 1.0)]))
    stream = spark.readStream.format("parquet").schema(EVENTS_SCHEMA).load(src)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    drop(1, _mk(spark, [(1, 2.0), (3, 7.0)]))
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT * FROM totals").collect()
    # last emission per user reflects lifetime state
    latest = {}
    for r in rows:
        latest[r.user_id] = (r.n_events, r.total_value, r.batch_events)
    assert latest[1] == (3, 17.0, 1)  # 2 events batch0 + 1 in batch1
    assert latest[2] == (1, 1.0, 1)
    assert latest[3] == (1, 7.0, 1)


def test_session_state_machine_closes_on_gap_and_watermark(spark, tmp_path):
    """Sessions close (a) inline when a gap appears INSIDE a batch, and
    (b) via event-time timeout when the watermark passes last_event+gap
    across batches; an active session emits nothing."""
    from datetime import datetime

    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.stateful import session_state_machine

    src = str(tmp_path / "src")
    os.makedirs(src)

    def drop(i, rows):
        df = spark.createDataFrame(
            [
                Row(
                    event_id=j,
                    ts=ts,
                    user_id=uid,
                    event_type="e",
                    value=v,
                    props="{}",
                )
                for j, (uid, ts, v) in enumerate(rows)
            ],
            schema=EVENTS_SCHEMA,
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/_s{i}")
        (part,) = glob.glob(f"{src}/_s{i}/*.parquet")
        shutil.move(part, f"{src}/b{i}.parquet")
        shutil.rmtree(f"{src}/_s{i}")

    # batch 0: user 1 has two sessions separated by a 20-min gap (closes
    # inline); the second session stays open. user 2 opens a session.
    drop(0, [
        (1, datetime(2024, 1, 1, 0, 0), 1.0),
        (1, datetime(2024, 1, 1, 0, 2), 2.0),
        (1, datetime(2024, 1, 1, 0, 30), 5.0),
        (2, datetime(2024, 1, 1, 0, 1), 9.0),
    ])
    stream = (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .load(src)
        .withWatermark("ts", "0 seconds")
    )
    q = (
        session_state_machine(stream, gap_seconds=300)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    got0 = {
        (r.user_id, r.session_start.isoformat()): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    # user 1's first session closed inline (gap inside the batch); user
    # 2's closed by TIMEOUT within the same run — batch 0's own watermark
    # (max ts 00:30) already passes its 00:01+gap close time. User 1's
    # second session (last event 00:30, closes 00:35) stays open: silent.
    assert got0 == {
        (1, "2024-01-01T00:00:00"): (2, 3.0),
        (2, "2024-01-01T00:01:00"): (1, 9.0),
    }

    # batch 1: a far-future event advances the watermark past the
    # remaining open session's last_event + gap -> it times out and emits
    drop(1, [(9, datetime(2024, 1, 1, 2, 0), 0.5)])
    q.processAllAvailable()
    q.stop()
    got1 = {
        (r.user_id, r.session_start.isoformat()): (
            r.n_events,
            r.total_value,
            r.session_end.isoformat(),
        )
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert got1[(1, "2024-01-01T00:30:00")] == (1, 5.0, "2024-01-01T00:35:00")
    assert got1[(2, "2024-01-01T00:01:00")] == (1, 9.0, "2024-01-01T00:06:00")
    # session_end = last_event + gap for the inline close too
    assert got1[(1, "2024-01-01T00:00:00")] == (2, 3.0, "2024-01-01T00:07:00")


# -- transformWithState (Spark 4 StatefulProcessor) --------------------------
#
# The runtime leg needs protobuf (absent in this sandbox -> skipped, runs
# when the env gains it); the SESSION SEMANTICS are pinned here by driving
# the processor directly against a fake handle and asserting it emits the
# same closed sessions the EventTimeTimeout implementation does.


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()
        self.timers: list[int] = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state

    def registerTimer(self, ts):
        self.timers.append(ts)

    def deleteTimer(self, ts):
        self.timers.remove(ts)


class _FakeExpiry:
    def __init__(self, ms):
        self._ms = ms

    def getExpiryTimeInMs(self):
        return self._ms


def _tws_batch(proc, key, rows):
    import pandas as pd

    df = pd.DataFrame(
        {"ts": [pd.Timestamp(t) for t, _v in rows], "value": [v for _t, v in rows]}
    )
    return list(proc.handleInputRows(key, iter([df]), None))


def test_tws_processor_matches_gap_session_semantics():
    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.stateful import SessionProcessor

    proc = SessionProcessor(gap_seconds=300)
    handle = _FakeHandle()
    proc.init(handle)

    # batch 1: two events 2 min apart (one session), then an in-batch
    # 30-min gap -> first session closes inline
    out = _tws_batch(
        proc, (1,),
        [("2024-01-01 00:00:00", 1.0), ("2024-01-01 00:02:00", 2.0),
         ("2024-01-01 00:30:00", 5.0)],
    )
    assert len(out) == 1
    closed = out[0].iloc[0]
    assert closed["n_events"] == 2 and closed["total_value"] == 3.0
    assert str(closed["session_end"]) == "2024-01-01 00:07:00"
    # exactly ONE live timer, armed at the open session's close time
    assert handle.timers == [proc_expiry(proc, "2024-01-01 00:30:00")]

    # batch 2: extend the open session -> old timer replaced, not stacked
    out = _tws_batch(proc, (1,), [("2024-01-01 00:33:00", 7.0)])
    assert out == []
    assert handle.timers == [proc_expiry(proc, "2024-01-01 00:33:00")]

    # stale timer fire (the batch-1 expiry) must NOT close the session
    stale = list(
        proc.handleExpiredTimer(
            (1,), None, _FakeExpiry(proc_expiry(proc, "2024-01-01 00:30:00"))
        )
    )
    assert stale == []
    assert handle.state.exists()

    # current timer fire closes it with the full accumulated payload
    fired = list(
        proc.handleExpiredTimer(
            (1,), None, _FakeExpiry(proc_expiry(proc, "2024-01-01 00:33:00"))
        )
    )
    assert len(fired) == 1
    final = fired[0].iloc[0]
    assert final["n_events"] == 2 and final["total_value"] == 12.0
    assert str(final["session_start"]) == "2024-01-01 00:30:00"
    assert str(final["session_end"]) == "2024-01-01 00:38:00"
    assert not handle.state.exists()

    # post-close fire on empty state is a no-op
    assert list(proc.handleExpiredTimer((1,), None, _FakeExpiry(0))) == []


def proc_expiry(proc, ts_str):
    import pandas as pd

    return int(pd.Timestamp(ts_str).value // 1_000_000) + proc.gap_ms


@pytest.mark.skipif(
    not __import__(
        "aws_glue_streaming_etl_with_apache_hudi_spark.streaming.stateful", fromlist=["tws_available"]
    ).tws_available(),
    reason="transformWithState needs protobuf (env-blocked in this sandbox)",
)
def test_tws_end_to_end_matches_event_time_timeout_impl(spark, tmp_path):
    """When the env has protobuf, the TWS operator must emit the same
    closed-session set as session_state_machine on a replayed fixture."""
    import tempfile
    from datetime import datetime

    from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import EVENTS_SCHEMA
    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.stateful import (
        session_state_machine,
        session_state_machine_tws,
    )

    rows = [
        (1, datetime(2024, 1, 1, 0, 0), 10, "view", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 2), 10, "click", 2.0, "{}"),
        (3, datetime(2024, 1, 1, 6, 0), 10, "view", 3.0, "{}"),
        (4, datetime(2030, 1, 1, 0, 0), -1, "sentinel", 0.0, "{}"),
    ]
    staging = str(tmp_path / "src")
    spark.createDataFrame(rows, schema=EVENTS_SCHEMA).write.parquet(staging)
    got = {}
    for name, op in [("apiw", session_state_machine), ("tws", session_state_machine_tws)]:
        stream = (
            spark.readStream.format("parquet").schema(EVENTS_SCHEMA)
            .load(staging).withWatermark("ts", "0 seconds")
        )
        sink = f"twse2e_{name}"
        q = (
            op(stream, gap_seconds=3600)
            .writeStream.format("memory").queryName(sink).outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ck_{name}")).start()
        )
        q.processAllAvailable(); q.stop()
        got[name] = sorted(
            (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.total_value)
            for r in spark.sql(f"SELECT * FROM {sink}").filter("user_id != -1").collect()
        )
    assert got["apiw"] == got["tws"] and got["apiw"]


def test_tws_processor_handles_multi_chunk_arrow_input():
    """ADVICE r7 #4: a key's batch may arrive as SEVERAL Arrow chunks;
    concatenating them without ignore_index duplicated index labels, so
    scalar lookups returned Series and int()/float() raised TypeError.
    Multi-chunk input must produce exactly the single-chunk result."""
    import pandas as pd

    from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.stateful import SessionProcessor

    events = [
        ("2024-01-01 00:00:00", 1.0),
        ("2024-01-01 00:02:00", 2.0),
        ("2024-01-01 00:30:00", 5.0),  # in-batch gap: closes session 1
        ("2024-01-01 00:31:00", 7.0),
    ]

    def chunk(rows):
        return pd.DataFrame(
            {"ts": [pd.Timestamp(t) for t, _v in rows],
             "value": [v for _t, v in rows]}
        )

    results = {}
    for label, chunks in [
        ("single", [chunk(events)]),
        # 2 chunks, each restarting its index at 0 (the Arrow reality)
        ("multi", [chunk(events[:2]), chunk(events[2:])]),
        # order shuffled across chunks: the processor sorts by ts itself
        ("multi_unordered", [chunk(events[2:]), chunk(events[:2])]),
    ]:
        proc = SessionProcessor(gap_seconds=300)
        handle = _FakeHandle()
        proc.init(handle)
        out = list(proc.handleInputRows((1,), iter(chunks), None))
        assert len(out) == 1, f"{label}: expected one closed session"
        closed = out[0].iloc[0]
        results[label] = (
            int(closed["n_events"]), float(closed["total_value"]),
            str(closed["session_start"]), str(closed["session_end"]),
            tuple(handle.state.get()),
        )
    assert results["single"] == results["multi"] == results["multi_unordered"]
    assert results["single"][:2] == (2, 3.0)
