"""Sinks: partitioned Parquet writes, small-file compaction, and the
optional Hudi connector gate.

The reference's sink is a Hudi COPY_ON_WRITE upsert via the Glue connector
(glue_job_script.py:105-109). Our default sink is the pure-Spark
``UpsertTable`` (operators/upsert.py); ``write_hudi`` uses the real
connector when its jars are on the classpath and raises otherwise so
callers fall back explicitly.

Small-file compaction matters at 100 TB: a streaming upsert that commits
every 10 s writes thousands of small files per partition per day; scan
throughput collapses (per-file open cost, footer reads, task overhead).
Hudi solves this with file-group sizing; the pure-Spark equivalent is a
periodic partition-local rewrite targeting a file size budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned Parquet write (layout A10 —
    glue_job_script.py:57-61,70)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def hudi_available(spark: SparkSession) -> bool:
    """True if the Hudi DataSource is on the JVM classpath. The test/bench
    image ships without it — everything falls back to the pure-Spark
    upsert path, which is the primary implementation here."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.hudi.DefaultSource")  # noqa: SLF001
        return True
    except Exception:
        return False


def write_hudi(
    df: DataFrame,
    path: str,
    table_name: str,
    record_key: str,
    precombine: str,
    partition_fields: list[str],
) -> None:
    """Write through the real Hudi connector with the reference's exact
    option set (glue_job_script.py:50-73). Raises RuntimeError when the
    connector is absent; callers use ``UpsertTable`` instead."""
    spark = df.sparkSession
    if not hudi_available(spark):
        raise RuntimeError(
            "Hudi connector not on classpath; use operators.upsert.UpsertTable"
        )
    options = {
        "hoodie.table.name": table_name,
        "hoodie.datasource.write.storage.type": "COPY_ON_WRITE",
        "hoodie.datasource.write.operation": "upsert",
        "hoodie.datasource.write.recordkey.field": record_key,
        "hoodie.datasource.write.precombine.field": precombine,
        "hoodie.datasource.write.partitionpath.field": ",".join(partition_fields),
        "hoodie.datasource.write.hive_style_partitioning": "true",
    }
    df.write.format("hudi").options(**options).mode("append").save(path)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_by: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
) -> None:
    """Partition-local small-file compaction: rewrite each partition's
    data into ceil(bytes / target) files.

    Uses a repartition keyed on the partition columns so rewriting stays
    partition-parallel; with dynamic partition overwrite only the
    rewritten partitions replace their files (commit unit = partition,
    same as the upsert path). Run out-of-band (the streaming query keeps
    appending) — the rewrite is idempotent."""
    df = spark.read.parquet(path)
    import math

    # estimate current bytes per partition from the file inventory
    files = df.inputFiles()
    total = 0
    for f in files:
        try:
            import os

            total += os.path.getsize(f.replace("file:", ""))
        except OSError:
            pass
    n_files = max(1, math.ceil(total / target_file_bytes))
    (
        df.repartition(n_files, *[df[c] for c in partition_by])
        .write.mode("overwrite")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_sized(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    target_records_per_file: int,
    mode: str = "overwrite",
) -> None:
    """Partitioned write with a per-file record budget
    (``maxRecordsPerFile``) — the write-side complement of
    ``compact_partitions``: prevention instead of cure. A task whose
    partition split exceeds the budget rolls to a new file, bounding
    file sizes WITHOUT an extra repartition shuffle (task parallelism is
    unchanged; only the writer's file rollover point moves). Use when a
    downstream consumer needs bounded files (range-restartable backfills,
    object-store multipart limits) and the natural task output would
    exceed them."""
    writer = df.write.mode(mode).option("maxRecordsPerFile", target_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
