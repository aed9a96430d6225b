"""The reference dataflow, Spark-native: stream -> foreachBatch -> upsert.

Reference (glue_job_script.py):

- A1  streaming source        :38-43  -> ``sources.stream_from_directory``
                                         (file source for hermetic replay;
                                         kafka/kinesis in production)
- A2  forEachBatch trigger    :111-118 -> ``writeStream.foreachBatch(...)
                                         .trigger(...)``
- A3  empty-batch guard       :98     -> ``df.isEmpty()`` (the reference's
                                         ``count() > 0`` materializes every
                                         batch twice — known anti-pattern,
                                         SURVEY.md §4)
- A7  schema evolution        :81-94  -> handled inside ``UpsertTable``
- A8-A11 Hudi upsert + sync   :50-73  -> ``UpsertTable.upsert``
- A12 checkpoint/bookmark     :116    -> ``checkpointLocation``
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import UpsertTable
from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import stream_from_directory


@dataclass
class StreamingUpsertPipeline:
    """End-to-end equivalent of the reference job (glue_job_script.py:96-118).

    ``source_dir``   directory watched by the streaming file source.
    ``schema``       stream schema (the catalog-declared stream table's role).
    ``table``        target ``UpsertTable`` (key/precombine/partition
                     semantics).
    ``checkpoint``   Structured Streaming checkpoint dir (A12) — restart
                     resumes from last committed offsets; combined with the
                     idempotent upsert, replays are no-ops.
    ``trigger``      processing-time interval; the reference's
                     ``window_size`` (default "10 seconds",
                     Glue_StreamingJob_Hudi_Template.yaml:33).
    """

    spark: SparkSession
    source_dir: str
    schema: T.StructType
    # any keyed table with Hudi upsert semantics: UpsertTable (COW),
    # MergeOnReadTable (MOR), or TimelineTable (COW + commit timeline)
    table: UpsertTable | object
    checkpoint: str
    trigger: str = "10 seconds"
    source_format: str = "parquet"
    max_files_per_trigger: int | None = 1
    transform: Callable[[DataFrame], DataFrame] | None = None
    # Dead-letter queue for JSON sources: unparseable payloads are
    # appended raw under this directory per batch instead of poisoning
    # or silently vanishing from the pipeline (sources/quarantine.py).
    quarantine_dir: str | None = None
    batches_seen: list[int] = field(default_factory=list)

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """The reference's ``processBatch`` (glue_job_script.py:96-109),
        minus the DynamicFrame identity round-trip (A4 — dropped).
        ``transform`` is the per-batch derivation hook (type coercion,
        partition-column derivation, enrichment) applied before the
        upsert."""
        if batch_df.isEmpty():  # A3, without the double materialization
            return
        self.batches_seen.append(batch_id)
        if self.quarantine_dir is not None:
            from aws_glue_streaming_etl_with_apache_hudi_spark.sources.quarantine import CORRUPT_COL

            if CORRUPT_COL in batch_df.columns:
                import os

                batch_df = batch_df.cache()
                bad = batch_df.filter(F.col(CORRUPT_COL).isNotNull()).select(
                    F.col(CORRUPT_COL).alias("raw")
                )
                if not bad.isEmpty():
                    bad.write.mode("overwrite").text(
                        os.path.join(self.quarantine_dir, f"batch={batch_id}")
                    )
                batch_df = batch_df.filter(F.col(CORRUPT_COL).isNull()).drop(
                    CORRUPT_COL
                )
                if batch_df.isEmpty():
                    return
        if self.transform is not None:
            batch_df = self.transform(batch_df)
        self.table.upsert(batch_df)

    def _stream_schema(self):
        if self.quarantine_dir is not None and self.source_format == "json":
            from aws_glue_streaming_etl_with_apache_hudi_spark.sources.quarantine import CORRUPT_COL

            if CORRUPT_COL not in [f.name for f in self.schema.fields]:
                return T.StructType(
                    list(self.schema.fields)
                    + [T.StructField(CORRUPT_COL, T.StringType())]
                )
        return self.schema

    def start(self, once: bool = False) -> StreamingQuery:
        stream = stream_from_directory(
            self.spark,
            self.source_dir,
            self._stream_schema(),
            fmt=self.source_format,
            max_files_per_trigger=self.max_files_per_trigger,
        )
        writer = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint)
            .outputMode("update")
        )
        if once:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=self.trigger)
        return writer.start()

    def run_available(self) -> None:
        """Process everything currently in ``source_dir`` and stop —
        deterministic replay for tests and backfills."""
        q = self.start(once=True)
        q.awaitTermination()


def run_stream_to_completion(query: StreamingQuery) -> None:
    """Drain a continuous streaming query synchronously (test helper)."""
    query.processAllAvailable()
    query.stop()
