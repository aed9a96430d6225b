"""Kafka/Kinesis source surface: option-map construction, start-position
vocabulary (reference: latest/trim_horizon/earliest), JSON value decode,
and the fail-fast gate when the connector JAR is absent (it is, here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_glue_streaming_etl_with_apache_hudi_spark.sources.kafka import (
    ConnectorUnavailableError,
    decode_json_values,
    kafka_source_options,
    kinesis_source_options,
    stream_from_kafka,
)


def test_kafka_options_map_reference_positions():
    opts = kafka_source_options("b:9092", "events", starting_position="trim_horizon")
    assert opts["startingOffsets"] == "earliest"
    assert opts["subscribe"] == "events"
    assert opts["kafka.bootstrap.servers"] == "b:9092"
    assert opts["failOnDataLoss"] == "false"
    assert "maxOffsetsPerTrigger" not in opts


def test_kafka_backpressure_knob():
    opts = kafka_source_options("b:9092", "t", max_offsets_per_trigger=50_000)
    assert opts["maxOffsetsPerTrigger"] == "50000"


def test_bad_position_rejected():
    with pytest.raises(ValueError, match="starting_position"):
        kafka_source_options("b:9092", "t", starting_position="yesterday")
    with pytest.raises(ValueError, match="starting_position"):
        kinesis_source_options("s", "us-east-1", starting_position="nope")


def test_kinesis_options_keep_reference_vocabulary():
    opts = kinesis_source_options("my-stream", "us-east-1", "trim_horizon")
    assert opts["startingPosition"] == "TRIM_HORIZON"
    assert opts["streamName"] == "my-stream"


def test_decode_json_values(spark):
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    raw = spark.createDataFrame(
        [(bytearray(b'{"user_id": 7, "event_type": "click"}'),), (bytearray(b"not json"),)],
        T.StructType([T.StructField("value", T.BinaryType())]),
    )
    out = decode_json_values(raw, schema).collect()
    assert (out[0].user_id, out[0].event_type) == (7, "click")
    assert out[1].user_id is None  # malformed -> nulls (PERMISSIVE)


def test_connector_gate_fails_fast(spark):
    schema = T.StructType([T.StructField("x", T.LongType())])
    with pytest.raises(ConnectorUnavailableError, match="--packages"):
        stream_from_kafka(spark, "localhost:9092", "t", schema)
