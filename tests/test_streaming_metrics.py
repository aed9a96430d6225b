"""Per-batch streaming metrics capture (streaming/metrics.py)."""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import EVENTS_SCHEMA
from aws_glue_streaming_etl_with_apache_hudi_spark.streaming.metrics import attach_metrics, metrics_df


def test_listener_captures_batch_progress(spark, tmp_path):
    from datetime import datetime

    src = str(tmp_path / "src")
    os.makedirs(src)
    batch = spark.createDataFrame(
        [
            Row(event_id=i, ts=datetime(2024, 1, 1, 0, i), user_id=i,
                event_type="click", value=1.0, props="{}")
            for i in range(5)
        ],
        schema=EVENTS_SCHEMA,
    )
    batch.coalesce(1).write.mode("overwrite").parquet(f"{src}/_stage")
    (part,) = glob.glob(f"{src}/_stage/*.parquet")
    shutil.move(part, f"{src}/b0.parquet")
    shutil.rmtree(f"{src}/_stage")

    listener = attach_metrics(spark)
    try:
        stream = spark.readStream.format("parquet").schema(EVENTS_SCHEMA).load(src)
        q = (
            stream.writeStream.format("memory")
            .queryName("metrics_sink")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # listener events are delivered asynchronously
        deadline = time.time() + 20
        while time.time() < deadline and not any(
            r[2] == 5 for r in listener.records
        ):
            time.sleep(0.2)

        df = metrics_df(spark, listener)
        rows = [r for r in df.collect() if r.num_input_rows == 5]
        assert rows, f"no 5-row batch captured: {listener.records}"
        assert rows[0].batch_duration_ms is None or rows[0].batch_duration_ms >= 0
        assert df.columns[:3] == ["query_id", "batch_id", "num_input_rows"]
    finally:
        spark.streams.removeListener(listener)
