"""Function-layer checks: portable hashing parity with hashlib/DuckDB,
vector math, sketch accuracy bounds."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.functions.hashing import stable_hash64, stable_hash64_sql
from aws_glue_streaming_etl_with_apache_hudi_spark.functions.vector import cosine_similarity, dot_product, l2_norm
from aws_glue_streaming_etl_with_apache_hudi_spark.sources.readers import load_table


def test_stable_hash64_matches_hashlib_and_duckdb(spark):
    import duckdb

    vals = ["", "a", "hello world", "ünïcode", "0|x"]
    df = spark.createDataFrame([Row(s=v) for v in vals])
    got = {r.s: r.h for r in df.select("s", stable_hash64("s").alias("h")).collect()}
    for v in vals:
        expected = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        assert got[v] == expected, v
        dd = duckdb.sql(f"SELECT {stable_hash64_sql('?')}".replace("?", f"'{v}'")).fetchone()[0]
        assert dd == expected, v


def test_vector_math(spark):
    df = spark.createDataFrame([Row(a=[3.0, 4.0], b=[4.0, 3.0])])
    r = df.select(
        dot_product("a", "b").alias("d"),
        l2_norm("a").alias("n"),
        F.round(cosine_similarity("a", "b"), 6).alias("c"),
    ).collect()[0]
    assert r.d == 24.0 and r.n == 5.0 and r.c == 0.96


def test_cosine_null_safe_on_zero_vector(spark):
    df = spark.createDataFrame([Row(a=[0.0, 0.0], b=[1.0, 1.0])])
    assert df.select(cosine_similarity("a", "b").alias("c")).collect()[0].c is None


def test_approx_sketches_within_error_bounds(spark, sf_oracle_dir):
    """approx_count_distinct (HLL++, default rsd 5%) and percentile_approx
    must land near exact values — the property that justifies them at
    100 TB."""
    li = load_table(spark, sf_oracle_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.count_distinct("l_partkey").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 5000).alias("p50a"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p50e"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.10
    assert abs(row.p50a - row.p50e) / row.p50e < 0.05
