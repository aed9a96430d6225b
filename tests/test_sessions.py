"""Gap-based sessionization (operators/sessions.py): hand-checked
session splits + single-exchange plan. Oracle parity for the fixture
query is in test_queries_oracle.py (sessionize_events)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.sessions import session_bounds, sessionize


def _df(spark):
    rows = [
        # user 1: two sessions split by a >1h gap
        (1, datetime(2024, 1, 1, 10, 0), 101),
        (1, datetime(2024, 1, 1, 10, 30), 102),
        (1, datetime(2024, 1, 1, 12, 31), 103),  # 2h01 gap -> new session
        # user 2: one session, events exactly at the gap boundary stay merged
        (2, datetime(2024, 1, 1, 9, 0), 201),
        (2, datetime(2024, 1, 1, 10, 0), 202),  # gap == 1h: NOT a new session
    ]
    return spark.createDataFrame(
        [Row(user_id=u, ts=ts, event_id=e) for u, ts, e in rows]
    )


def test_sessionize_assigns_ordinals(spark):
    s = sessionize(_df(spark), "user_id", "ts", gap="1 hour", tie_breakers=["event_id"])
    got = {r.event_id: r.session_id for r in s.collect()}
    assert got == {101: 1, 102: 1, 103: 2, 201: 1, 202: 1}


def test_session_bounds(spark):
    b = session_bounds(_df(spark), "user_id", "ts", gap="1 hour", tie_breakers=["event_id"])
    rows = {(r.user_id, r.session_id): r.n_events for r in b.collect()}
    assert rows == {(1, 1): 2, (1, 2): 1, (2, 1): 2}


def test_single_exchange_plan(spark):
    """Both window functions and the session aggregation must reuse ONE
    shuffle on the entity key — no second exchange after the windows."""
    b = session_bounds(_df(spark), "user_id", "ts", gap="1 hour", tie_breakers=["event_id"])
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
