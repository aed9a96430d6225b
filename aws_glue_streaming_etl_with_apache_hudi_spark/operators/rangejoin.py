"""Binned range joins: the scale path for interval predicates without an
equi key.

Spark executes a join whose ONLY predicate is a range condition
(``p.ts BETWEEN i.start AND i.end``) as a BroadcastNestedLoopJoin or a
CartesianProduct — O(n·m) comparisons that a filter cannot save. The
standard fix (used by every warehouse's range-join optimization) is
binning: quantize time into fixed-width bins, explode each interval to
the bins it covers, map each point to its single bin, equi-join on the
bin id, and apply the exact range predicate as a residual filter. The
shuffle keys become bin ids (plus any real equi keys), the join is a
plain hash/sort-merge join, and the comparison count drops from n·m to
the true candidate count.

Choosing ``bin_width``: ~the typical interval length. Each interval
explodes to ``len/width + 1`` bins — too narrow multiplies the interval
side, too wide turns bins into hot keys (every point and interval in one
bucket). With width == max interval length every interval covers at most
2 bins, which is the sweet spot when interval lengths are uniform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bin_of(col: Column, width_s: int) -> Column:
    # cast timestamp -> epoch seconds; integer division is bin id.
    # floor() on the long keeps negative epochs correct.
    return F.floor(col.cast("long") / F.lit(width_s)).cast("long")


def binned_range_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    point_col: str,
    bin_width_seconds: int,
    equi_keys: list[str] | None = None,
    how: str = "inner",
    interval_id: list[str] | None = None,
) -> DataFrame:
    """Join ``points`` to every interval containing them:
    ``start <= point < end`` (+ optional equi keys), as a bin equi-join.

    Column names must be disjoint between the two frames apart from
    ``equi_keys`` (pre-select/alias on the way in). ``how`` supports
    ``inner`` and ``left`` (= every interval, points NULL when empty).
    ``left`` requires ``interval_id``: columns that uniquely and
    non-nullably identify an interval row — the unmatched intervals are
    reattached by id, so the outer join itself never carries the
    residual predicate.

    Scale: the interval side grows by the bins-per-interval factor
    (bounded by len/width + 1); the point side is never replicated; the
    only shuffle keys are (bin, *equi_keys). No nested-loop join exists
    anywhere in the plan (gated in tests/test_rangejoin.py).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    equi_keys = list(equi_keys or [])
    overlap = (set(intervals.columns) & set(points.columns)) - set(equi_keys)
    if overlap:
        raise ValueError(f"ambiguous columns (alias them first): {sorted(overlap)}")

    w = bin_width_seconds
    # end is EXCLUSIVE: the last covered bin is the one containing end-1s
    # (second granularity: a point in [end-1s, end) shares end's bin when
    # end is bin-aligned, so keep end's own bin too — the residual filter
    # discards the false candidates; one extra bin, never a missed match)
    lo = _bin_of(F.col(start_col), w)
    hi = _bin_of(F.col(end_col), w)
    exploded = intervals.withColumn("_bin", F.explode(F.sequence(lo, hi)))
    binned_points = points.withColumn("_bin", _bin_of(F.col(point_col), w))

    matched = (
        exploded.join(binned_points, ["_bin", *equi_keys])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_bin")
    )
    if how == "inner":
        return matched
    # left: reattach unmatched intervals (by unique id) with NULL points
    if not interval_id:
        raise ValueError("how='left' requires interval_id columns")
    point_cols = [c for c in points.columns if c not in equi_keys]
    return intervals.join(
        matched.select(*interval_id, *point_cols), interval_id, "left"
    )
