"""Property-based law for the binned range join (hypothesis): for ANY
interval/point configuration and ANY bin width, the binned join equals the
naive theta join — binning is a physical-only rewrite, never a semantic
one. Exercises the adversarial geometries a fixed fixture misses:
bin-aligned boundaries, zero-length-adjacent intervals, nested and
overlapping intervals, widths far from the interval lengths."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.rangejoin import binned_range_join

BASE = dt.datetime(2024, 1, 1)

interval = st.tuples(
    st.integers(min_value=0, max_value=600),   # start (minutes)
    st.integers(min_value=1, max_value=300),   # duration (minutes)
)
point = st.integers(min_value=-30, max_value=960)


@given(
    ivals=st.lists(interval, min_size=1, max_size=12),
    pts=st.lists(point, min_size=1, max_size=25),
    width_minutes=st.sampled_from([1, 7, 60, 240, 600]),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_binned_equals_theta_for_any_geometry(spark, ivals, pts, width_minutes):
    intervals = spark.createDataFrame(
        [
            (i, BASE + dt.timedelta(minutes=s), BASE + dt.timedelta(minutes=s + d))
            for i, (s, d) in enumerate(ivals)
        ],
        "iid long, start timestamp, end timestamp",
    )
    points = spark.createDataFrame(
        [(i, BASE + dt.timedelta(minutes=m)) for i, m in enumerate(pts)],
        "pid long, p_ts timestamp",
    )
    got = binned_range_join(
        intervals, points, "start", "end", "p_ts",
        bin_width_seconds=width_minutes * 60,
    ).select("iid", "pid")
    naive = intervals.join(
        points, (F.col("p_ts") >= F.col("start")) & (F.col("p_ts") < F.col("end"))
    ).select("iid", "pid")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))
