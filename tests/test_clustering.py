"""Z-order clustered writes: Morton encoding correctness + the layout
actually tightens per-file column ranges (the data-skipping property)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.clustering import (
    cluster_write,
    file_range_spans,
    interleave_bits,
    zorder_value,
)


def test_interleave_bits_known_values(spark):
    # Morton(x=0b11, y=0b01) with 2 bits: bit i of col c -> position i*2+c
    # x contributes bits {0,2}=5, y contributes bit {1}=2 -> z=7
    df = spark.range(1).select(
        interleave_bits([F.lit(3), F.lit(1)], bits=2).alias("z")
    )
    assert df.collect()[0].z == 0b111
    # order matters: swapping columns permutes bit positions
    df2 = spark.range(1).select(
        interleave_bits([F.lit(1), F.lit(3)], bits=2).alias("z")
    )
    assert df2.collect()[0].z == 0b1011


def test_interleave_is_monotone_in_each_dim(spark):
    # fixing one coordinate, z grows with the other
    df = spark.range(16).select(
        F.col("id").alias("x"),
        interleave_bits([F.col("id"), F.lit(5)], bits=4).alias("z"),
    )
    rows = df.orderBy("x").collect()
    zs = [r.z for r in rows]
    assert zs == sorted(zs)


def test_zorder_value_locality(spark):
    """Points close in BOTH dims get closer z-values than points close in
    one dim but far in the other (the property that makes files cover
    hyper-rectangles)."""
    df = spark.createDataFrame(
        [(0, 0), (1, 1), (0, 255), (255, 0)], ["x", "y"]
    )
    z = {(r.x, r.y): r.z for r in df.select(
        "x", "y", zorder_value(df, ["x", "y"], bits=8).alias("z")
    ).collect()}
    near = abs(z[(0, 0)] - z[(1, 1)])
    far1 = abs(z[(0, 0)] - z[(0, 255)])
    far2 = abs(z[(0, 0)] - z[(255, 0)])
    assert near < far1 and near < far2


@pytest.mark.parametrize("col", ["o_custkey", "o_totalprice"])
def test_clustered_files_have_tight_ranges(spark, sf_dir, tmp_path, col):
    """After Z-ordering on (o_custkey, o_totalprice), each file's span of
    EITHER clustered column is a small fraction of the domain — vs ~full
    domain for hash-distributed files. This is exactly what parquet
    min/max skipping keys on."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_files = 8

    zpath = str(tmp_path / "z")
    cluster_write(orders, zpath, ["o_custkey", "o_totalprice"], n_files=n_files)

    rpath = str(tmp_path / "r")
    orders.repartition(n_files).write.mode("overwrite").parquet(rpath)

    def avg_span(path):
        df = spark.read.parquet(path).withColumn("_file", F.input_file_name())
        spans = file_range_spans(df, col).collect()
        return sum(r.span_frac for r in spans) / len(spans)

    z_span, r_span = avg_span(zpath), avg_span(rpath)
    # hash layout: every file spans ~the whole domain; z layout: a corner
    assert r_span > 0.9
    assert z_span < 0.6 * r_span, f"{col}: z={z_span:.3f} vs random={r_span:.3f}"


def test_cluster_write_preserves_rows(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "z2")
    cluster_write(orders, path, ["o_custkey", "o_orderkey"], n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)  # helper column dropped
