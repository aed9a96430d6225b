"""Golden test for the custom stateful operator (applyInPandasWithState):
state persists across micro-batches and resumes deterministically."""

from __future__ import annotations

import glob
import os
import shutil

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
