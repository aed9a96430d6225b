"""Table profiling operator: per-column stats in one scan."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.profile import profile_columns
from aws_glue_streaming_etl_with_apache_hudi_spark.queries import QUERIES


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [
            Row(a=1, b="x"),
            Row(a=1, b=None),
            Row(a=None, b="y"),
            Row(a=3, b="x"),
        ]
    )
    rows = {r.col_name: r for r in profile_columns(df, ["a", "b"]).collect()}
    assert rows["a"].n_rows == 4 and rows["a"].n_nulls == 1
    assert rows["a"].n_distinct == 2  # 1, 3 (null excluded)
    assert rows["a"].min_value == "1" and rows["a"].max_value == "3"
    assert rows["b"].n_nulls == 1 and rows["b"].n_distinct == 2
    assert rows["b"].min_value == "x" and rows["b"].max_value == "y"


def test_profile_formatter_applies_after_native_minmax(spark):
    """min/max order on the NATIVE type; the formatter only renders.
    (String ordering would put 9.5 above 10.25.)"""
    df = spark.createDataFrame([Row(v=9.5), Row(v=10.25)])
    rows = profile_columns(
        df, ["v"],
        formatters={"v": lambda c: F.round(c, 2).cast("decimal(18,2)").cast("string")},
    ).collect()
    assert rows[0].min_value == "9.50" and rows[0].max_value == "10.25"


def test_table_profile_is_single_scan(spark, sf_dir):
    """All six columns' stats must come from ONE aggregate over one scan
    — a per-column loop would read the table six times."""
    plan = (
        QUERIES["table_profile"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan parquet") == 1
