"""Storage-layout queries: the MOR read-side merge algebra and the
Z-order (Morton) encoding kernel, both DuckDB-oracle-checked. The IO
behavior (append-only commits, scheduled compaction, clustered file
spans) is covered behaviorally in tests/test_mor.py and
tests/test_clustering.py; these queries pin the MATH."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.clustering import interleave_bits
from aws_glue_streaming_etl_with_apache_hudi_spark.operators.mor import mor_merge_view
from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import register, t

_EVENT_COLS = ["user_id", "ts", "event_id", "event_type", "value"]


@register(
    "mor_merge_chain",
    sql="""
    SELECT user_id, event_id, event_type, round(value, 2) AS value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) x
    WHERE rn = 1 ORDER BY user_id
    """,
)
def mor_merge_chain(spark, sf_dir):
    """MOR read-side merge across a base + two pending delta commits must
    equal the single-pass latest state — the transitivity law that makes
    compaction timing unobservable to readers (operators/mor.py; Hudi
    MERGE_ON_READ vs the reference's pinned COW, glue_job_script.py:53).
    Batches are event-time thirds of the stream, like a replayed ingest."""
    e = t(spark, sf_dir, "events").select(*_EVENT_COLS)
    cut1 = F.lit("2024-01-10 00:00:00").cast("timestamp")
    cut2 = F.lit("2024-01-20 00:00:00").cast("timestamp")
    from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import precombine_latest

    base = precombine_latest(e.filter(F.col("ts") < cut1), ["user_id"], "ts")
    d1 = e.filter((F.col("ts") >= cut1) & (F.col("ts") < cut2))
    d2 = e.filter(F.col("ts") >= cut2)
    merged = mor_merge_view(base, [d1, d2], ["user_id"], "ts")
    return merged.select(
        "user_id", "event_id", "event_type", F.round("value", 2).alias("value")
    ).orderBy("user_id")


def _morton_sql(bits: int) -> str:
    """DuckDB expression: interleave `bx`/`by` (bit i of column c lands at
    position i*2+c) — mirrors clustering.interleave_bits exactly."""
    terms = []
    for i in range(bits):
        terms.append(f"(((bx >> {i}) & 1) << {2 * i})")
        terms.append(f"(((by >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@register(
    "zorder_morton_keys",
    sql=f"""
    SELECT o_orderkey, zval FROM (
      SELECT o_orderkey, {_morton_sql(8)} AS zval
      FROM (SELECT o_orderkey, o_custkey % 256 AS bx, o_orderkey % 256 AS by
            FROM orders)
    ) ORDER BY zval, o_orderkey LIMIT 500
    """,
)
def zorder_morton_keys(spark, sf_dir):
    """Morton/Z-order encoding kernel over fixed 8-bit bucket ids — the
    exact integer math `cluster_write` sorts by (operators/clustering.py),
    checked bit-for-bit against DuckDB's bitwise ops. Pure codegen'd
    shift/or expression tree; no UDF."""
    o = t(spark, sf_dir, "orders")
    z = interleave_bits(
        [F.col("o_custkey") % 256, F.col("o_orderkey") % 256], bits=8
    )
    return (
        o.select("o_orderkey", z.alias("zval"))
        .orderBy("zval", "o_orderkey")
        .limit(500)
    )
