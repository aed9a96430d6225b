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
