"""Property-based check of the upsert algebra (hypothesis): splitting any
event log into arbitrary batch prefixes and folding them through
``upsert_dataframe`` must equal the single-pass latest-state — the law
that makes checkpoint replay and backfill safe."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.upsert import precombine_latest, upsert_dataframe

event = st.tuples(
    st.integers(min_value=0, max_value=4),  # key
    st.integers(min_value=0, max_value=50),  # precombine
    st.integers(min_value=0, max_value=999),  # payload
)


@given(
    events=st.lists(event, min_size=1, max_size=30),
    split=st.integers(min_value=0, max_value=29),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_batched_merge_equals_single_pass(spark, events, split):
    # unique tie-break id per row makes expected choice deterministic
    rows = [(k, p, v, i) for i, (k, p, v) in enumerate(events)]
    cols = ["k", "p", "v", "row_id"]
    all_df = spark.createDataFrame(rows, cols)
    split = min(split, len(rows))
    a = spark.createDataFrame(rows[:split], cols) if split else None
    b = spark.createDataFrame(rows[split:], cols) if split < len(rows) else None

    single = precombine_latest(all_df, ["k"], "p", tie_breakers=["row_id"])

    if a is None:
        merged = precombine_latest(b, ["k"], "p", tie_breakers=["row_id"])
    elif b is None:
        merged = precombine_latest(a, ["k"], "p", tie_breakers=["row_id"])
    else:
        stored = precombine_latest(a, ["k"], "p", tie_breakers=["row_id"])
        merged = upsert_dataframe(stored, b, ["k"], "p", tie_breakers=["row_id"])

    # Compare on (k, p, v): the merge's provenance tie-break prefers the
    # later batch on equal precombine, and within a batch row_id breaks
    # ties — both resolve to the max-row_id row, same as single-pass.
    got = sorted((r.k, r.p, r.v) for r in merged.collect())
    want = sorted((r.k, r.p, r.v) for r in single.collect())
    assert got == want
