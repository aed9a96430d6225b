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

    return _stream_commit_dirs(
        spark, os.path.join(table.path, "deltas"), schema, max_files_per_trigger
    )


def _stream_commit_dirs(
    spark: SparkSession,
    log_dir: str,
    schema: T.StructType,
    max_files_per_trigger: int | None,
) -> DataFrame:
    """File-streaming source over a ``commit=N`` partitioned log dir,
    exposing the commit id as ``COMMIT_COL`` — shared by the COW and MOR
    incremental streams.

    The ``commit`` partition column is declared IN the schema rather
    than left to directory inference: with inference, a log whose
    retained window is currently empty (everything cleaned, next commit
    not yet written) has no ``commit=N`` dir to infer from and the later
    rename would fail to resolve — declaring it makes an empty log a
    valid stream that simply waits for the next commit."""
    if "commit" in {f.name for f in schema.fields}:
        raise ValueError(
            "table schema has a column literally named 'commit', which "
            "collides with the log's partition key; rename the column "
            "before streaming the log"
        )
    declared = T.StructType(
        list(schema.fields) + [T.StructField("commit", T.IntegerType())]
    )
    reader = spark.readStream.schema(declared)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(log_dir)
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
    directories).

    Two properties consumers rely on, both asserted in
    tests/test_incremental_stream.py:
    - a COMPACTION emits nothing (it writes base files, not log files),
      so followers never see duplicate records when the table compacts;
    - every upsert arrives exactly once, tagged ``_commit_id``.

    Clean-vs-stream contract (inherent to the file source, so stated
    rather than papered over): a stream STARTED after a ``clean`` begins
    at the retained window with no error — unlike batch
    ``read_incremental(begin=0)``, which raises below the horizon; use
    ``table.timeline()`` to detect cleaned history if completeness
    matters. And ``clean`` must not outrun live followers: deleting a
    commit a lagging stream has listed but not yet processed fails that
    stream (Hudi's cleaner has the same rule — retain at least the
    slowest consumer's window).

    ``table`` may be a ``MergeOnReadTable`` or its path."""
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor import MergeOnReadTable

    if isinstance(table, str):
        table = MergeOnReadTable(spark=spark, path=table, keys=[], precombine="")
    if not table.exists():
        raise ValueError(f"cannot stream an empty MOR table: {table.path}")
    schema = T.StructType.fromJson(json.loads(table._meta()["schema"]))
    return _stream_commit_dirs(
        spark, os.path.join(table.path, "log"), schema, max_files_per_trigger
    )
