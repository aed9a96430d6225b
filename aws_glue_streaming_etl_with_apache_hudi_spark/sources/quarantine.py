"""Corrupt-record quarantine for JSON ingestion.

The reference ingests schemaless JSON off Kinesis with the OpenX JSON
SerDe + ``inferSchema`` (glue_job_script.py:42, …Template.yaml:102-104)
and has NO malformed-record path: a bad payload either vanishes
silently or fails the batch. Real pipelines need the third option —
load what parses, quarantine what doesn't, never lose a byte.

Spark-native design: read in ``PERMISSIVE`` mode with a declared
``_corrupt_record`` column. Rows that fail to parse have every data
column null and the raw text preserved in the corrupt column; one
filter splits the batch into (clean, quarantined). The quarantine sink
is an append-only dated directory, so poisoned payloads are replayable
after a parser/schema fix — the dead-letter-queue pattern at table
granularity. All of this is a metadata-only projection + filter on the
scan: no extra pass over the data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_json_with_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read JSON under ``schema``; returns ``(clean, corrupt)``.

    ``clean``   rows that parsed (corrupt column dropped).
    ``corrupt`` one ``raw`` string column with the original payload of
                every row that failed to parse.

    Spark requires the corrupt-record column to be cached/materialized
    before referencing it alone — both outputs keep at least one data
    column in the plan to stay inside the supported surface.
    """
    declared = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = spark.read.schema(declared).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    ).json(path)
    df = df.cache()  # Spark disallows filtering on the corrupt column alone
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return clean, corrupt


def quarantine_batch(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    quarantine_dir: str,
    batch_id: int = 0,
) -> DataFrame:
    """Ingestion step with a dead-letter queue: parse ``path``, append
    unparseable payloads under ``quarantine_dir/batch=<id>/`` (raw text,
    replayable), return the clean rows. Returns the clean DataFrame."""
    clean, corrupt = read_json_with_quarantine(spark, path, schema)
    if not corrupt.isEmpty():
        corrupt.write.mode("overwrite").text(
            os.path.join(quarantine_dir, f"batch={batch_id}")
        )
    return clean
