"""Golden tests for streaming-native ops (no DuckDB oracle — SURVEY.md
§5.4): tumbling windows with watermark + late-data drop, session windows,
stream dedup. Hand-checked expected outputs over a tiny crafted stream."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import EVENTS_SCHEMA
from aws_glue_streaming_etl_with_apache_hudi_spark.streaming import windows as SW


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [
            Row(event_id=i, ts=ts, user_id=uid, event_type=et, value=v, props="{}")
            for i, (ts, uid, et, v) in enumerate(rows)
        ],
        schema=EVENTS_SCHEMA,
    )


def _run_stream(spark, tmp_path, batches, build, output_mode):
    """Drive one micro-batch per input batch: drop a file, drain the
    stream, repeat — deterministic watermark advancement between batches.
    Collect from a memory sink."""
    import glob
    import shutil

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)

    def drop_file(i, batch):
        batch.coalesce(1).write.mode("overwrite").parquet(f"{src}/_stage{i}")
        (part,) = glob.glob(f"{src}/_stage{i}/*.parquet")
        shutil.move(part, f"{src}/b{i}.parquet")
        shutil.rmtree(f"{src}/_stage{i}")

    drop_file(0, batches[0])
    stream = spark.readStream.format("parquet").schema(EVENTS_SCHEMA).load(src)
    name = f"sink_{abs(hash(str(tmp_path)))}"
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    for i, batch in enumerate(batches[1:], start=1):
        drop_file(i, batch)
        q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_tumbling_watermark_drops_late_data(spark, tmp_path):
    # batch 0: hours 10 and 11. batch 1: hour 15 (watermark advances to 13
    # AFTER the batch, closing the hour-10/11 windows). batch 2: a LATE
    # hour-10 event, now beyond the watermark -> dropped.
    b0 = _mk_events(
        spark,
        [
            (_ts(10, 5), 1, "click", 1.0),
            (_ts(10, 20), 2, "click", 2.0),
            (_ts(11, 5), 1, "view", 3.0),
        ],
    )
    b1 = _mk_events(spark, [(_ts(15, 0), 1, "click", 4.0)])
    b2 = _mk_events(spark, [(_ts(10, 40), 3, "click", 99.0)])  # late: dropped
    rows = _run_stream(
        spark,
        tmp_path,
        [b0, b1, b2],
        lambda s: SW.tumbling_counts(s, watermark="2 hours"),
        "append",
    )
    got = {(r.window_start, r.event_type): (r.n, r.total) for r in rows}
    # hour-10 click window closed with the pre-late contents only
    assert got[(_ts(10), "click")] == (2, 3.0)
    assert got[(_ts(11), "view")] == (1, 3.0)
    # hour-15 window never closes (watermark never passes 16:00) — append
    # mode doesn't emit it
    assert (_ts(15), "click") not in got


def test_session_window_merges_within_gap(spark, tmp_path):
    b0 = _mk_events(
        spark,
        [
            (_ts(10, 0), 1, "click", 1.0),
            (_ts(10, 20), 1, "click", 1.0),  # within 30m gap: same session
            (_ts(12, 0), 1, "click", 1.0),  # new session
            (_ts(10, 0), 2, "view", 1.0),
        ],
    )
    b1 = _mk_events(spark, [(_ts(20, 0), 9, "click", 1.0)])  # push watermark
    rows = _run_stream(
        spark,
        tmp_path,
        [b0, b1],
        lambda s: SW.session_counts(s, gap="30 minutes", watermark="2 hours"),
        "append",
    )
    sessions = {(r.user_id, r.session_start): (r.session_end, r.n_events) for r in rows}
    assert sessions[(1, _ts(10, 0))] == (_ts(10, 50), 2)  # merged, end = last+gap
    assert sessions[(1, _ts(12, 0))] == (_ts(12, 30), 1)
    assert sessions[(2, _ts(10, 0))] == (_ts(10, 30), 1)


def test_stream_dedup_across_batches(spark, tmp_path):
    b0 = _mk_events(spark, [(_ts(10), 1, "click", 1.0), (_ts(10), 1, "click", 1.0)])
    b1 = _mk_events(spark, [(_ts(10), 1, "click", 5.0), (_ts(11), 2, "view", 2.0)])
    rows = _run_stream(
        spark,
        tmp_path,
        [b0, b1],
        lambda s: SW.stream_dedup(s, ["user_id", "event_type"]),
        "append",
    )
    keys = [(r.user_id, r.event_type) for r in rows]
    assert sorted(keys) == [(1, "click"), (2, "view")]
    # first arrival wins: the value from batch 0
    vals = {(r.user_id, r.event_type): r.value for r in rows}
    assert vals[(1, "click")] == 1.0


def test_stream_stream_join_within_interval(spark, tmp_path):
    """Stream-stream inner join with watermarks: purchases join clicks of
    the same user within the preceding hour. Both sides buffer state
    bounded by their watermark + the join interval."""
    from pyspark.sql import functions as F

    b0 = _mk_events(
        spark,
        [
            (_ts(10, 0), 1, "click", 1.0),
            (_ts(10, 30), 1, "purchase", 9.0),  # joins the 10:00 click
            (_ts(12, 0), 2, "click", 1.0),
        ],
    )
    b1 = _mk_events(
        spark,
        [
            (_ts(14, 0), 2, "purchase", 5.0),  # 2h after click: outside interval
            (_ts(20, 0), 9, "click", 0.0),  # watermark push
        ],
    )

    import glob
    import shutil

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)

    def drop(i, df):
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/_s{i}")
        (p,) = glob.glob(f"{src}/_s{i}/*.parquet")
        shutil.move(p, f"{src}/b{i}.parquet")
        shutil.rmtree(f"{src}/_s{i}")

    drop(0, b0)
    stream = spark.readStream.format("parquet").schema(EVENTS_SCHEMA).load(src)
    clicks = (
        stream.filter("event_type = 'click'")
        .withWatermark("ts", "2 hours")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    )
    purchases = (
        stream.filter("event_type = 'purchase'")
        .withWatermark("ts", "2 hours")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), "value")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND c_ts <= p_ts AND c_ts >= p_ts - INTERVAL 1 HOUR"
        ),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    drop(1, b1)
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT p_user, value FROM ssj").collect()
    got = sorted((r.p_user, r.value) for r in rows)
    # only user 1's purchase joins (within the hour); user 2's is outside
    assert got == [(1, 9.0)]


def test_stream_dedup_within_watermark_bounds_state_by_window(spark, tmp_path):
    """dropDuplicatesWithinWatermark vs dropDuplicates — the semantics
    that differ are exactly the scale contract: duplicates inside the
    redelivery window are dropped, but once the watermark passes the
    first occurrence's ts + delay the key's state is GONE, so a genuine
    re-occurrence later re-emits. Plain dropDuplicates (event time not
    in the key) keeps the key's state forever — it suppresses the late
    re-occurrence AND its state grows with lifetime key cardinality."""
    b0 = _mk_events(
        spark,
        [
            (_ts(10, 0), 1, "click", 1.0),
            (_ts(10, 5), 1, "click", 2.0),  # in-batch redelivery: dropped
        ],
    )
    b1 = _mk_events(
        spark,
        [
            (_ts(10, 10), 1, "click", 3.0),  # still inside the 1h window: dropped
            (_ts(13, 0), 9, "view", 0.0),    # watermark pusher -> 12:00
        ],
    )
    b2 = _mk_events(
        spark,
        [
            (_ts(12, 30), 1, "click", 4.0),  # state expired (wm 12:00 > 11:00)
            (_ts(20, 0), 8, "view", 0.0),    # flush
        ],
    )
    rows = _run_stream(
        spark,
        tmp_path / "within",
        [b0, b1, b2],
        lambda s: SW.stream_dedup_within_watermark(s, ["user_id", "event_type"]),
        "append",
    )
    clicks = sorted((r.ts, r.value) for r in rows if r.user_id == 1)
    assert clicks == [(_ts(10, 0), 1.0), (_ts(12, 30), 4.0)], clicks

    # contrast: plain dropDuplicates suppresses the 12:30 re-occurrence
    rows_plain = _run_stream(
        spark,
        tmp_path / "plain",
        [b0, b1, b2],
        lambda s: SW.stream_dedup(s, ["user_id", "event_type"]),
        "append",
    )
    clicks_plain = sorted((r.ts, r.value) for r in rows_plain if r.user_id == 1)
    assert clicks_plain == [(_ts(10, 0), 1.0)], clicks_plain
