"""Property-based law for distributed_running_agg (hypothesis): for ANY
value distribution (skewed mass, duplicates, negatives, nulls) and ANY
bucket count, the two-phase running sum/max equals the single-partition
global window it replaces — bucketing is a physical-only rewrite. The
quantile sketch only balances load; strict-comparison bucketing means it
can never change the answer, and these cases probe exactly the
geometries a fixed fixture misses (all-equal tails around boundaries,
single-bucket degeneracy, max-carrying nulls)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_running_agg

# values: heavy duplication + outlier mass + negatives; None = SQL NULL
val = st.one_of(
    st.just(None),
    st.integers(min_value=-5, max_value=5),
    st.sampled_from([10_000, -10_000]),
)


@given(
    vals=st.lists(val, min_size=1, max_size=60),
    buckets=st.sampled_from([1, 2, 7, 32]),
    agg=st.sampled_from(["sum", "max"]),
    inclusive=st.booleans(),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_two_phase_equals_global_window(spark, vals, buckets, agg, inclusive):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, v long"
    )
    got = distributed_running_agg(
        df, "k", ["v"], ["out"], buckets=buckets, agg=agg, inclusive=inclusive
    )
    hi = Window.currentRow if inclusive else -1
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, hi)
    jagg = F.sum if agg == "sum" else F.max
    want = df.withColumn("out", jagg("v").over(w))
    g = {r["k"]: r["out"] for r in got.collect()}
    x = {r["k"]: r["out"] for r in want.collect()}
    assert g == x  # including NULL-before-first-value prefixes
