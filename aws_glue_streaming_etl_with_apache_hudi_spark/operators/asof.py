"""As-of (nearest-timestamp) join — the generic operator behind
``asof_join_events_orders``.

Spark has no native as-of join; the naive form (equi-join on the key,
range condition, row_number to keep the nearest) materializes
|left x right-per-key| pairs before pruning — quadratic in per-key
activity. The scalable form used here is **union-and-carry-forward**:
tag both sides, sort each key's single timeline once, and carry the
latest (or next) right-side values across left rows with
``last(..., ignorenulls)`` / ``first(..., ignorenulls)`` over a running
window. ONE shuffle on the key, zero join explosion — the same plan
shape pandas users know as ``merge_asof``, distributed.

Semantics match ``pandas.merge_asof``:
- direction="backward": most recent right row with right_ts <= left_ts
- direction="forward":  earliest   right row with right_ts >= left_ts
- tolerance: matches farther than the tolerance away are nulled out
  (the left row survives, unmatched — merge_asof's behavior)

Ties on the right timestamp are broken by ``tie_breakers`` (ascending;
the LAST row in that order wins for backward, the FIRST for forward) —
explicit, because a distributed engine has no "input order" to fall
back on the way pandas does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_SENTINEL_SUFFIX = "__asof"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    direction: str = "backward",
    tolerance: str | None = None,
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """Join each left row to its as-of right row per ``on`` key.

    Returns every left column plus ``right_values`` and ``right_ts``
    (the matched row's timestamp — null, like the values, when no right
    row qualifies or the match exceeds ``tolerance``).

    ``tolerance`` is a SQL interval expression, e.g.
    ``"INTERVAL 7 DAYS"``. Column names in ``right_values`` must not
    collide with left columns; alias before joining.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got: {direction}")
    carried = [right_ts, *right_values]
    dup = set(carried) & set(left.columns)
    if dup:
        raise ValueError(f"right columns collide with left: {sorted(dup)}")
    reserved = {"_t", "_side", "_row" + _SENTINEL_SUFFIX}
    bad = reserved & (set(left.columns) | set(carried))
    if bad:
        raise ValueError(f"reserved column names in inputs: {sorted(bad)}")

    # one timeline: _t is the shared time axis, _side orders equal
    # timestamps so the boundary row is visible to the running window
    # (backward <= : right before left; forward >= : left before right)
    left_side, right_side = (1, 0) if direction == "backward" else (0, 1)
    lt = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(left_side))
    rt = (
        right.select(*on, *carried)
        .withColumn("_t", F.col(right_ts))
        .withColumn("_side", F.lit(right_side))
    )
    tagged = lt.unionByName(rt, allowMissingColumns=True)

    # Carry the matched right row as ONE struct, not column-by-column:
    # independent last/first(ignorenulls) per column would resurrect a
    # stale value from an OLDER right row whenever the nearest row holds
    # a null in that column — mixing columns across rows and breaking
    # merge_asof parity (a null value in the nearest row must surface as
    # null). The struct is non-null exactly on right rows (even when
    # every field inside is null), so the carry is atomic.
    row_col = "_row" + _SENTINEL_SUFFIX
    tagged = tagged.withColumn(
        row_col,
        F.when(
            F.col("_side") == right_side, F.struct(*[F.col(c) for c in carried])
        ),
    )
    tie = [F.col(c) for c in (tie_breakers or [])]
    if direction == "backward":
        w = (
            W.partitionBy(*on)
            .orderBy(F.col("_t"), F.col("_side"), *tie)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        picked = F.last(row_col, ignorenulls=True).over(w)
    else:
        w = (
            W.partitionBy(*on)
            .orderBy(F.col("_t"), F.col("_side"), *tie)
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        picked = F.first(row_col, ignorenulls=True).over(w)

    matched = tagged.select(
        *[F.col(c) for c in left.columns],
        F.col("_side"),
        F.col("_t"),
        picked.alias(row_col),
    ).filter(F.col("_side") == left_side)

    if tolerance is not None:
        mts = F.col(row_col)[right_ts]
        if direction == "backward":
            in_tol = mts + F.expr(tolerance) >= F.col("_t")
        else:
            in_tol = mts <= F.col("_t") + F.expr(tolerance)
        matched = matched.withColumn(row_col, F.when(in_tol, F.col(row_col)))

    return matched.select(
        *[F.col(c) for c in left.columns],
        *[F.col(row_col)[c].alias(c) for c in carried],
    )
