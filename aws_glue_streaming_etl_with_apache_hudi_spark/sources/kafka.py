"""Kafka / Kinesis streaming source surface (SURVEY.md §2 A1).

The reference's source is a Glue-catalog Kinesis stream with JSON
payloads and a configurable start position
(``glue_job_script.py:38-43``, positions ``:32-33``; stream definition
``…Template.yaml:56-104``). In open Spark the same plan is
``readStream.format("kafka")`` (first-party connector) or the Kinesis
DSv2 connector — identical downstream pipeline, different option map.

This module builds those option maps and the value-decoding projection.
The connector JARs are deployment artifacts (not bundled here, and not
in the test container), so ``load`` fails fast with a clear message when
the format is unavailable; everything downstream of ``.load()`` — JSON
parsing, schema application, watermarking, the foreachBatch upsert — is
connector-independent and fully tested against the file source, which
shares the wire format (JSON lines) with the reference's stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# reference start positions (glue_job_script.py:32-33) -> Kafka dialect
_START_POSITIONS = {
    "latest": "latest",
    "trim_horizon": "earliest",
    "earliest": "earliest",
}


class ConnectorUnavailableError(RuntimeError):
    """The requested streaming connector is not on the classpath."""


def kafka_source_options(
    brokers: str,
    topic: str,
    starting_position: str = "latest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """Option map for ``readStream.format("kafka")``.

    ``starting_position`` accepts the REFERENCE's vocabulary
    (latest/trim_horizon/earliest, glue_job_script.py:32-33) and maps it
    to Kafka's startingOffsets. ``max_offsets_per_trigger`` bounds
    micro-batch size — the backpressure knob that keeps a 10-second
    trigger (A2) stable under burst; without it one slow batch snowballs.
    """
    pos = _START_POSITIONS.get(starting_position.lower())
    if pos is None:
        raise ValueError(
            f"starting_position must be one of {sorted(_START_POSITIONS)}, "
            f"got {starting_position!r}"
        )
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": pos,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kinesis_source_options(
    stream_name: str,
    region: str,
    starting_position: str = "latest",
) -> dict[str, str]:
    """Option map for the Kinesis DSv2 connector — the reference's actual
    source (…Template.yaml:56-104). Position vocabulary passes through
    unchanged (the connector speaks trim_horizon natively)."""
    if starting_position.lower() not in _START_POSITIONS:
        raise ValueError(
            f"starting_position must be one of {sorted(_START_POSITIONS)}, "
            f"got {starting_position!r}"
        )
    return {
        "streamName": stream_name,
        "region": region,
        "startingPosition": starting_position.upper(),
    }


def decode_json_values(raw: DataFrame, schema: T.StructType) -> DataFrame:
    """Kafka wire → typed rows: cast the value bytes to string, parse JSON
    with an explicit schema (the reference infers per-batch,
    ``inferSchema: true`` glue_job_script.py:41 — an anti-pattern we
    replace with a declared schema so a malformed batch can't silently
    retype a column), and flatten. Malformed records become nulls
    (PERMISSIVE), to be routed by the pipeline's quarantine filter."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("v")
    ).select("v.*")


def stream_from_kafka(
    spark: SparkSession,
    brokers: str,
    topic: str,
    schema: T.StructType,
    starting_position: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Unbounded typed DataFrame over a Kafka topic (A1, Kafka dialect).

    Fails fast with guidance if the Kafka connector JAR is absent
    (deployments pass ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``).
    """
    reader = spark.readStream.format("kafka").options(
        **kafka_source_options(
            brokers,
            topic,
            starting_position=starting_position,
            max_offsets_per_trigger=max_offsets_per_trigger,
        )
    )
    try:
        raw = reader.load()
    except Exception as e:  # connector class not on classpath
        raise ConnectorUnavailableError(
            "Kafka connector not available in this Spark distribution; "
            "submit with --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            f"(underlying error: {type(e).__name__})"
        ) from e
    return decode_json_values(raw, schema)
