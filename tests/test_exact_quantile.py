"""Distributed exact quantile selection (operators/skew.py
distributed_exact_quantile): bounded-round range refinement must return
EXACTLY the ceil(q*n)-th smallest value per group — including heavy
ties, singleton groups, constant columns, and extreme q."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.skew import distributed_exact_quantile


def _ref(vals, q):
    return sorted(vals)[max(1, math.ceil(q * len(vals))) - 1]


def _run(spark, groups: dict, qs):
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, x double")
    out = distributed_exact_quantile(df, "x", ["g"], qs=list(qs), rounds=5)
    return {(r.g, r.q): r.value for r in out.collect()}


def test_deterministic_cases(spark):
    groups = {
        "a": [1, 2, 3, 4],
        "b": [10, 10, 10, 20, 30],   # heavy ties
        "c": [7],                    # singleton
        "d": [5, 5, 5, 5],           # constant
    }
    got = _run(spark, groups, [0.5, 0.9])
    for g, vs in groups.items():
        for q in (0.5, 0.9):
            assert got[(g, q)] == _ref(vs, q), (g, q)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.dictionaries(
        keys=st.sampled_from(["g1", "g2", "g3"]),
        values=st.lists(
            st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=40
        ),
        min_size=1,
        max_size=3,
    ),
    st.sampled_from([0.01, 0.25, 0.5, 0.75, 0.99]),
)
def test_matches_reference_property(spark, groups, q):
    got = _run(spark, groups, [q])
    for g, vs in groups.items():
        assert got[(g, q)] == _ref(vs, q), (g, q, sorted(vs))
