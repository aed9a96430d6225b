"""Gap-based sessionization — the batch counterpart of
``F.session_window`` (streaming session windows live in
streaming/windows paths; goldens in tests/test_streaming_windows.py).

The reference's product is an event stream queried with SQL
(README.md:3-7); sessionizing a user/event stream is the canonical
analytic over it, and — unlike ``F.session_window`` — the
lag-and-cumulative-sum formulation below is exactly replayable in ANSI
SQL, so it is DuckDB-oracle-checkable.

Algorithm (all built-in window functions, no UDF):

1. ``lag(ts)`` per entity ordered by (ts, *tie_breakers);
2. a session *starts* where the gap to the previous event exceeds
   ``gap`` (or there is no previous event);
3. ``sum(start_flag)`` over the same window, rows unbounded-preceding →
   session ordinal per entity.

Scale: both windows shuffle ONCE on the entity column and sort within
partitions — one exchange reused across the two window functions
(Catalyst collapses same-spec windows into a single Window physical op).
Skewed entities are bounded by per-user event counts; at 100 TB the
shuffle key is ``entity`` which is the natural partitioning for any
downstream per-session aggregation, so no extra exchange follows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity: str,
    ts: str,
    gap: str = "12 hours",
    tie_breakers: list[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-entity session ordinal (1, 2, …) to every row.

    ``gap`` is a SQL interval string; a new session starts when
    ``ts - previous ts > gap``. ``tie_breakers`` make the intra-entity
    order total when timestamps can collide (determinism for the
    oracle compare).
    """
    order = [F.col(ts)] + [F.col(c) for c in (tie_breakers or [])]
    w = Window.partitionBy(entity).orderBy(*order)
    prev = F.lag(F.col(ts)).over(w)
    is_start = F.when(
        prev.isNull() | (F.col(ts) - prev > F.expr(f"INTERVAL {gap}")), 1
    ).otherwise(0)
    running = Window.partitionBy(entity).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(is_start).over(running))


def session_bounds(
    df: DataFrame,
    entity: str,
    ts: str,
    gap: str = "12 hours",
    tie_breakers: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Sessionize then collapse to one row per (entity, session):
    start/end timestamps, event count, plus caller aggregates."""
    s = sessionize(df, entity, ts, gap, tie_breakers)
    return s.groupBy(entity, "session_id").agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        *(aggs or []),
    )
