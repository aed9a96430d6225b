"""Streaming incremental read of a TimelineTable — Hudi's streaming
query type (``hoodie.datasource.query.type=incremental`` under
``readStream``), pure Structured Streaming.

The timeline table's ``deltas/commit=N/`` layout is an append-only file
log: each upsert commit adds exactly one directory of Parquet files and
never rewrites an old one. That is precisely the contract of Spark's
file streaming source, so an incremental consumer is just
``spark.readStream.parquet(deltas/)`` with the table's schema — the
source's own checkpointed file tracking provides resume-from-offset
(the analogue of Hudi's ``begin.instanttime``), and each micro-batch
carries the *changed records* of newly-arrived commits, never the table.

At 100 TB this is the ingest→derive fan-out pattern: downstream jobs
(aggregations, index builds, replicas) follow the table by tailing
deltas that are O(change), with zero load on the snapshot data. Each
record carries ``_commit_id`` (derived from its delta directory name)
so consumers can reason about instants; per-key collapsing, if a
consumer wants "latest state only", is the same ``incremental_view``
algebra applied inside ``foreachBatch``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import COMMIT_COL, TimelineTable


def read_incremental_stream(
    spark: SparkSession,
    table: TimelineTable | str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Open a streaming DataFrame over a timeline table's commit deltas.

    ``table`` may be a ``TimelineTable`` or its path. The schema is
    pinned from the latest instant metadata (streaming sources need an
    explicit schema); later additive schema changes surface as nulls
    until the consumer restarts with the evolved schema — the same
    additive contract as the batch side (operators/schema_evolution.py).
    """
    if isinstance(table, str):
        table = _table_from_path(spark, table)
    instants = table.commits()
    if not instants:
        raise ValueError(f"cannot stream an empty timeline table: {table.path}")
    schema = T.StructType.fromJson(json.loads(instants[-1]["schema"]))
    # tombstone deltas (TimelineTable.delete) carry a _deleted flag that
    # the snapshot schema never has; declare it so delete events survive
    # the stream (non-tombstone deltas read it as null -> "not deleted")
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.timeline import DELETED_COL

    if DELETED_COL not in [f.name for f in schema.fields]:
        schema = T.StructType(
            list(schema.fields) + [T.StructField(DELETED_COL, T.BooleanType())]
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(os.path.join(table.path, "deltas"))
    # deltas/commit=N is a partitioned-directory layout, so the commit id
    # arrives as a (string) partition column named by the dir key; expose
    # it under the engine's standard name.
    return df.withColumn(COMMIT_COL, F.col("commit").cast("int")).drop("commit")


def _table_from_path(spark: SparkSession, path: str) -> TimelineTable:
    """Rehydrate a TimelineTable handle from its on-disk timeline
    (keys/precombine/partitioning are data-independent here — streaming
    reads only need the path + schema, so placeholders suffice)."""
    t = TimelineTable(spark=spark, path=path, keys=[], precombine="")
    if not t.commits():
        raise ValueError(f"no timeline at {path}")
    return t


def read_mor_incremental_stream(
    spark: SparkSession,
    table,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming incremental read of a ``MergeOnReadTable``: tail the
    retained commit log (``log/commit=N/``) as a file-streaming source —
    the MOR counterpart of ``read_incremental_stream``, possible since
    the log is append-only and survives compaction (operators/mor.py:
    compaction advances ``compacted_through``; only ``clean`` removes
    directories, and the file source never re-lists processed files).

    Two properties consumers rely on, both asserted in
    tests/test_incremental_stream.py:
    - a COMPACTION emits nothing (it writes base files, not log files),
      so followers never see duplicate records when the table compacts;
    - every upsert arrives exactly once, tagged ``_commit_id``.

    ``table`` may be a ``MergeOnReadTable`` or its path."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor import MergeOnReadTable

    if isinstance(table, str):
        table = MergeOnReadTable(spark=spark, path=table, keys=[], precombine="")
    if not table.exists():
        raise ValueError(f"cannot stream an empty MOR table: {table.path}")
    schema = T.StructType.fromJson(json.loads(table._meta()["schema"]))
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(os.path.join(table.path, "log"))
    return df.withColumn(COMMIT_COL, F.col("commit").cast("int")).drop("commit")
