"""Stream-stream interval join (streaming/joins.py): two watermarked
file-source streams joined on key + event-time range, checked against the
identical batch composition (the golden the append-mode inner join must
reproduce once all input is processed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import load_table
from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.joins import interval_join

VIEW_COLS = ("user_id", "view_id", "view_ts")
CLICK_COLS = ("user_id", "click_id", "click_ts")


def _sides(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    return views, clicks


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    views, clicks = _sides(spark, sf_dir)
    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    views.coalesce(1).write.parquet(vdir)
    clicks.coalesce(1).write.parquet(cdir)

    expected = {
        (r.user_id, r.view_id, r.click_id)
        for r in interval_join(
            views, clicks, "user_id", "view_ts", "click_ts",
            upper="INTERVAL 6 HOURS",
        ).collect()
    }
    assert expected, "fixture must produce at least one attributed pair"

    vstream = spark.readStream.schema(views.schema).parquet(vdir)
    cstream = spark.readStream.schema(clicks.schema).parquet(cdir)
    out = interval_join(
        vstream, cstream, "user_id", "view_ts", "click_ts",
        upper="INTERVAL 6 HOURS",
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.view_id, r.click_id)
        for r in spark.sql("SELECT * FROM ssj").collect()
    }
    assert got == expected


def test_interval_join_rejects_unknown_type(spark, sf_dir):
    views, clicks = _sides(spark, sf_dir)
    import pytest

    with pytest.raises(ValueError, match="join type"):
        interval_join(views, clicks, "user_id", "view_ts", "click_ts", how="cross")


def test_interval_join_left_outer_keeps_unmatched_views(spark, sf_dir):
    """Batch-mode leftOuter: every view appears; unmatched ones carry null
    click columns (streaming emits these after the watermark passes)."""
    views, clicks = _sides(spark, sf_dir)
    out = interval_join(
        views, clicks, "user_id", "view_ts", "click_ts",
        upper="INTERVAL 6 HOURS", how="leftOuter",
    )
    n_views = views.count()
    per_view = out.groupBy("view_id").count()
    assert per_view.count() == n_views
    unmatched = out.filter(F.col("click_id").isNull()).count()
    matched_views = out.filter(F.col("click_id").isNotNull()).select("view_id").distinct().count()
    assert unmatched == n_views - matched_views


def test_stream_left_outer_emits_nulls_after_watermark(spark, sf_dir, tmp_path):
    """Streaming leftOuter semantics: matched pairs emit as found;
    unmatched views emit with null click columns only after the
    watermark passes their interval. A far-future sentinel row in BOTH
    streams advances the global watermark past every real interval, so
    the final state is exactly (batch inner pairs) + (unmatched views as
    nulls), with only the sentinel's own interval still pending."""
    import glob
    import os
    import shutil

    views, clicks = _sides(spark, sf_dir)
    far = F.expr("timestamp'2024-06-01 00:00:00'")
    sent_v = views.limit(1).select(
        "user_id", (F.col("view_id") + 10**6).alias("view_id"), far.alias("view_ts")
    )
    sent_c = clicks.limit(1).select(
        "user_id", (F.col("click_id") + 10**6).alias("click_id"), far.alias("click_ts")
    )

    def put(df, d, name):
        df.coalesce(1).write.mode("overwrite").parquet(d + "/_t")
        os.makedirs(d, exist_ok=True)
        shutil.move(glob.glob(d + "/_t/*.parquet")[0], f"{d}/{name}.parquet")
        shutil.rmtree(d + "/_t")

    vdir, cdir = str(tmp_path / "v"), str(tmp_path / "c")
    put(views, vdir, "a_main")
    put(clicks, cdir, "a_main")

    vs = spark.readStream.schema(views.schema).option("maxFilesPerTrigger", "1").parquet(vdir)
    cs = spark.readStream.schema(clicks.schema).option("maxFilesPerTrigger", "1").parquet(cdir)
    out = interval_join(
        vs, cs, "user_id", "view_ts", "click_ts",
        upper="INTERVAL 6 HOURS", how="leftOuter",
    )
    q = (
        out.writeStream.format("memory").queryName("loj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        put(sent_v, vdir, "b_sent")
        put(sent_c, cdir, "b_sent")
        q.processAllAvailable()
    finally:
        q.stop()

    batch_pairs = {
        (r.user_id, r.view_id, r.click_id)
        for r in interval_join(
            views, clicks, "user_id", "view_ts", "click_ts", upper="INTERVAL 6 HOURS"
        ).collect()
    }
    rows = spark.sql("SELECT * FROM loj").collect()
    matched = {(r.user_id, r.view_id, r.click_id) for r in rows if r.click_id is not None}
    assert matched == batch_pairs
    n_views = views.count()
    matched_views = len({v for _, v, _ in batch_pairs})
    nulls = [r for r in rows if r.click_id is None]
    # every real unmatched view has been flushed; the sentinel's own
    # interval is the only one still open
    assert len(nulls) == n_views - matched_views
    assert all(r.view_id <= 10**6 for r in nulls)


def test_stream_full_outer_emits_both_sides_after_watermark(spark, sf_dir, tmp_path):
    """fullOuter stream-stream: matched pairs as found; unmatched VIEWS
    null-padded on the click side AND unmatched CLICKS null-padded on
    the view side, each flushed once the watermark passes its interval.
    The coalesced key survives on right-only rows."""
    import glob
    import os
    import shutil

    views, clicks = _sides(spark, sf_dir)
    far = F.expr("timestamp'2024-06-01 00:00:00'")
    sent_v = views.limit(1).select(
        "user_id", (F.col("view_id") + 10**6).alias("view_id"), far.alias("view_ts")
    )
    sent_c = clicks.limit(1).select(
        "user_id", (F.col("click_id") + 10**6).alias("click_id"), far.alias("click_ts")
    )

    def put(df, d, name):
        df.coalesce(1).write.mode("overwrite").parquet(d + "/_t")
        os.makedirs(d, exist_ok=True)
        shutil.move(glob.glob(d + "/_t/*.parquet")[0], f"{d}/{name}.parquet")
        shutil.rmtree(d + "/_t")

    vdir, cdir = str(tmp_path / "v"), str(tmp_path / "c")
    put(views, vdir, "a_main")
    put(clicks, cdir, "a_main")

    vs = spark.readStream.schema(views.schema).option("maxFilesPerTrigger", "1").parquet(vdir)
    cs = spark.readStream.schema(clicks.schema).option("maxFilesPerTrigger", "1").parquet(cdir)
    out = interval_join(
        vs, cs, "user_id", "view_ts", "click_ts",
        upper="INTERVAL 6 HOURS", how="fullOuter",
    )
    q = (
        out.writeStream.format("memory").queryName("foj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        put(sent_v, vdir, "b_sent")
        put(sent_c, cdir, "b_sent")
        q.processAllAvailable()
    finally:
        q.stop()

    batch_pairs = {
        (r.user_id, r.view_id, r.click_id)
        for r in interval_join(
            views, clicks, "user_id", "view_ts", "click_ts", upper="INTERVAL 6 HOURS"
        ).collect()
    }
    rows = spark.sql("SELECT * FROM foj").collect()
    matched = {
        (r.user_id, r.view_id, r.click_id)
        for r in rows
        if r.click_id is not None and r.view_id is not None
    }
    assert matched == batch_pairs

    # left-only rows (unmatched real views) — same census as leftOuter
    n_views = views.count()
    matched_views = len({v for _, v, _ in batch_pairs})
    left_only = [r for r in rows if r.click_id is None]
    assert len(left_only) == n_views - matched_views

    # right-only rows: clicks no view interval covered; key coalesced
    matched_clicks = len({c for _, _, c in batch_pairs})
    right_only = [r for r in rows if r.view_id is None]
    assert all(r.user_id is not None for r in right_only)
    n_real_clicks = clicks.count()
    # every real unmatched click flushed (sentinel's interval still open)
    real_right_only = [r for r in right_only if r.click_id <= 10**6]
    assert len(real_right_only) == n_real_clicks - matched_clicks


def test_interval_join_right_outer_type_accepted(spark, sf_dir):
    views, clicks = _sides(spark, sf_dir)
    out = interval_join(
        views, clicks, "user_id", "view_ts", "click_ts",
        upper="INTERVAL 6 HOURS", how="rightOuter",
    )
    # batch evaluation: every click appears; unmatched ones null-padded
    assert out.count() >= clicks.count()
    assert out.filter(F.col("view_id").isNull()).count() == out.count() - interval_join(
        views, clicks, "user_id", "view_ts", "click_ts", upper="INTERVAL 6 HOURS"
    ).count()
