"""Schema evolution (A7) — reference behavior with its latent bugs fixed
(SURVEY.md §1.2: equal-schema NameError, first-run bootstrap, type
conflicts)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.schema_evolution import (
    evolve_schema,
    unify_schemas,
)


def test_equal_schema_noop(spark):
    df = spark.createDataFrame([Row(a=1, b="x")])
    b, t = evolve_schema(df, df)
    assert b.schema == df.schema and t.schema == df.schema


def test_first_run_bootstrap(spark):
    df = spark.createDataFrame([Row(a=1)])
    b, t = evolve_schema(df, None)
    assert b is df and t is None


def test_additive_columns_both_ways(spark):
    batch = spark.createDataFrame([Row(name="a", new_col=5)])
    target = spark.createDataFrame([Row(name="b", old_col="y")])
    b, t = evolve_schema(batch, target)
    assert set(b.columns) == {"name", "new_col", "old_col"}
    assert b.schema == t.schema
    merged = {r["name"]: r.asDict() for r in b.unionByName(t).collect()}
    assert merged["a"]["old_col"] is None and merged["b"]["new_col"] is None


def test_type_conflict_numeric_widening(spark):
    batch = spark.createDataFrame([Row(k="a", x=1)])  # long
    target_schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("x", T.DoubleType())]
    )
    target = spark.createDataFrame([("b", 2.5)], schema=target_schema)
    b, t = evolve_schema(batch, target)
    assert dict(b.dtypes)["x"] == "double"
    assert b.schema == t.schema


def test_type_conflict_fallback_to_string(spark):
    batch = spark.createDataFrame([Row(k="a", x=True)])
    target = spark.createDataFrame([Row(k="b", x=3)])
    b, t = evolve_schema(batch, target)
    assert dict(b.dtypes)["x"] == "string"
    vals = {r.k: r.x for r in b.unionByName(t).collect()}
    assert vals == {"a": "true", "b": "3"}


def test_unify_preserves_left_order():
    left = T.StructType([T.StructField("a", T.LongType()), T.StructField("b", T.StringType())])
    right = T.StructType([T.StructField("c", T.LongType()), T.StructField("a", T.LongType())])
    assert list(unify_schemas(left, right)) == ["a", "b", "c"]
