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


# -- r10 (VERDICT r9 task 7): adversarial bucketing boundary cases ----------
# The geometries that bit the rank primitives before a property suite
# existed: a value domain so clustered every quantile boundary collapses
# (one bucket gets everything), null/NaN order values (engine tie/sort
# rules), and timestamp/NTZ order columns (r9 added acceptance).


def _window_twin(df, agg, inclusive, order="k"):
    hi = Window.currentRow if inclusive else -1
    w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, hi)
    jagg = F.sum if agg == "sum" else F.max
    return df.withColumn("out", jagg("v").over(w))


def _assert_equals_window(spark, df, agg="sum", inclusive=True, buckets=32, order="k"):
    got = distributed_running_agg(
        df, order, ["v"], ["out"], buckets=buckets, agg=agg, inclusive=inclusive
    )
    want = _window_twin(df, agg, inclusive, order)
    g = {r[order]: r["out"] for r in got.collect()}
    x = {r[order]: r["out"] for r in want.collect()}
    assert g == x


def test_collapsed_boundaries_single_bucket(spark):
    """Order keys distinct but so clustered that every approx-quantile
    boundary is (nearly) the same double — the bounds set dedupes to a
    handful of values and one bucket takes almost all rows. Correctness
    must not depend on the sketch's geometry."""
    rows = [(1.0 + i * 1e-12, i % 7 - 3) for i in range(50)]
    df = spark.createDataFrame(rows, "k double, v long")
    for agg in ("sum", "max"):
        _assert_equals_window(spark, df, agg=agg, buckets=32)


def test_null_order_key_matches_window(spark):
    """ONE null order key among distinct values (more would be an
    order-tie, outside the total-order contract): Spark sorts nulls
    FIRST both in the bucket-local window and the global twin, and the
    null embeds to bucket 0 — running values must agree."""
    rows = [(None, 100)] + [(float(i), i) for i in range(20)]
    df = spark.createDataFrame(rows, "k double, v long")
    for agg in ("sum", "max"):
        for inclusive in (True, False):
            got = distributed_running_agg(
                df, "k", ["v"], ["out"], buckets=8, agg=agg, inclusive=inclusive
            )
            want = _window_twin(df, agg, inclusive)
            key = lambda r: (r["k"] is not None, r["k"])
            g = [(r["k"], r["out"]) for r in sorted(got.collect(), key=key)]
            x = [(r["k"], r["out"]) for r in sorted(want.collect(), key=key)]
            assert g == x


def test_nan_order_key_matches_window(spark):
    """NaN sorts GREATER than every double in Spark; percentile_approx
    ignores it. The NaN row must land in the last bucket and carry the
    final running value, exactly as under the global window."""
    rows = [(float("nan"), 7)] + [(float(i), i) for i in range(20)]
    df = spark.createDataFrame(rows, "k double, v long")
    import math as _math

    for agg in ("sum", "max"):
        got = distributed_running_agg(df, "k", ["v"], ["out"], buckets=8, agg=agg)
        want = _window_twin(df, agg, True)
        key = lambda r: (_math.isnan(r["k"]), r["k"])
        g = [(r["out"]) for r in sorted(got.collect(), key=key)]
        x = [(r["out"]) for r in sorted(want.collect(), key=key)]
        assert g == x


def test_timestamp_and_ntz_order_columns(spark):
    """r9 added timestamp/NTZ acceptance to _orderable_as_double; pin the
    running sum against the window twin on both types."""
    import datetime as _dt

    base = _dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [(base + _dt.timedelta(seconds=i * 13, microseconds=i), i) for i in range(25)]
    for typ in ("timestamp", "timestamp_ntz"):
        df = spark.createDataFrame(rows, f"k {typ}, v long")
        _assert_equals_window(spark, df, agg="sum", buckets=6)
        _assert_equals_window(spark, df, agg="max", inclusive=False, buckets=6)
