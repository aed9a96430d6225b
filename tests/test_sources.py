"""Source layer: format round-trips, nanosecond-timestamp handling, view
registration (catalog surface)."""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from aws_glue_streaming_etl_with_apache_hudi_spark.sources import readers as R


def test_events_ts_matches_duckdb_microseconds(spark, sf_dir):
    """events.parquet stores TIMESTAMP(NANOS); our loader must truncate to
    the exact microsecond values DuckDB produces (oracle comparability)."""
    import duckdb

    got = {
        r.event_id: r.ts
        for r in R.load_table(spark, sf_dir, "events").select("event_id", "ts").limit(50).collect()
    }
    con = duckdb.connect()
    exp = dict(
        con.execute(
            f"SELECT event_id, ts FROM read_parquet('{sf_dir}/events.parquet') "
            f"WHERE event_id IN ({','.join(map(str, got))})"
        ).fetchall()
    )
    assert {k: v.replace(tzinfo=None) for k, v in got.items()} == exp


def test_events_schema_is_typed(spark, sf_dir):
    df = R.load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    assert isinstance(df.schema["value"].dataType, T.DoubleType)


def test_json_csv_round_trip(spark, tmp_path):
    df = R.load_table(spark, str("/root/testdata/sf0.001"), "nation")
    jdir, cdir = str(tmp_path / "j"), str(tmp_path / "c")
    df.write.json(jdir)
    df.write.option("header", "true").csv(cdir)

    back_j = R.read_json(spark, jdir, schema=df.schema)
    assert sorted(map(tuple, back_j.collect())) == sorted(map(tuple, df.collect()))

    back_c = R.read_csv(spark, cdir, schema=df.schema)
    assert sorted(map(tuple, back_c.collect())) == sorted(map(tuple, df.collect()))


def test_json_schema_inference_matches_reference_behavior(spark, tmp_path):
    """The reference infers stream schemas from JSON payloads
    (glue_job_script.py:42); our JSON reader with schema=None does the
    same for batch."""
    p = str(tmp_path / "in.json")
    with open(p, "w") as f:
        f.write('{"name": "a", "date": "2024-01-01", "age": 3}\n')
        f.write('{"name": "b", "date": "2024-01-02", "city": "x"}\n')
    df = R.read_json(spark, p)
    assert set(df.columns) == {"name", "date", "age", "city"}


def test_register_views_sql_surface(spark, sf_dir):
    R.register_views(spark, sf_dir)
    n = spark.sql("SELECT count(*) AS n FROM region").collect()[0].n
    assert n == 5


def test_stream_source_builds(spark, sf_dir, tmp_path):
    src = str(tmp_path / "s")
    R.load_table(spark, sf_dir, "events").limit(10).write.parquet(src)
    stream = R.stream_from_directory(spark, src, R.EVENTS_SCHEMA)
    assert stream.isStreaming


def test_rate_source_smoke(spark):
    """Streaming rate source (synthetic benchmark stream — SURVEY §2
    'streaming file/rate source')."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", "100").load()
    assert rate.isStreaming
    assert [f.name for f in rate.schema.fields] == ["timestamp", "value"]
    q = (
        rate.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("append")
        .start()
    )
    import time

    time.sleep(2)
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT count(*) n FROM rate_smoke").collect()[0].n >= 0


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC read path: round-trip a fixture table and confirm the same
    pushdown/pruning contract the parquet scans get (both formats share
    Spark's vectorized columnar reader)."""
    from pyspark.sql import functions as F

    from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import load_table, read_orc

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(path)

    back = read_orc(spark, path)
    assert back.count() == orders.count()
    assert dict(back.dtypes) == dict(orders.dtypes)

    from aws_glue_streaming_etl_with_apache_hudi_spark.plans import has_pushed_filter

    pruned = back.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    assert has_pushed_filter(pruned, "o_orderstatus")
