"""Streaming job metrics — the engine-native analogue of the Glue job /
CloudWatch metrics the reference relies on for monitoring (job defined
with ``--enable-metrics``-style defaults in the CFN template; the
pipeline itself exposes nothing).

``BatchMetricsListener`` hooks Spark's StreamingQueryListener and keeps
one record per completed micro-batch: input rows, processing rate,
batch duration, watermark — the numbers that answer "is the pipeline
keeping up with the stream?". ``metrics_df`` turns the buffer into a
DataFrame so lag/throughput dashboards are just more queries on the
same engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQueryListener

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("input_rows_per_second", T.DoubleType()),
        T.StructField("processed_rows_per_second", T.DoubleType()),
        T.StructField("batch_duration_ms", T.LongType()),
        T.StructField("watermark", T.StringType()),
    ]
)


class BatchMetricsListener(StreamingQueryListener):
    """Buffers one metrics record per completed micro-batch."""

    def __init__(self) -> None:
        self.records: list[tuple] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        duration = (p.durationMs or {}).get("triggerExecution")
        self.records.append(
            (
                str(p.id),
                p.batchId,
                p.numInputRows,
                float(p.inputRowsPerSecond or 0.0),
                float(p.processedRowsPerSecond or 0.0),
                int(duration) if duration is not None else None,
                (p.eventTime or {}).get("watermark"),
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach_metrics(spark: SparkSession) -> BatchMetricsListener:
    """Register a fresh listener on the session; returns it. Call
    ``spark.streams.removeListener(listener)`` when done (tests do)."""
    listener = BatchMetricsListener()
    spark.streams.addListener(listener)
    return listener


def metrics_df(spark: SparkSession, listener: BatchMetricsListener) -> DataFrame:
    """The captured metrics as a queryable DataFrame (empty-safe)."""
    return spark.createDataFrame(listener.records, METRICS_SCHEMA)
