"""Stream-stream interval joins.

The reference pipeline's only join is stream-static enrichment (the
Hudi upsert keyed on the static table's key, `glue_job_script.py:44-56`);
a complete streaming engine also needs the *stream-stream* shape —
correlating two live streams within a time bound (impression->click
attribution, order->shipment matching, sensor pairing).

Spark-first design: `Dataset.join` between two watermarked streams with
an equi-key plus an event-time range predicate. Structured Streaming
derives the state-retention bound from the watermark + range condition,
so each side buffers only rows inside the interval horizon — state is
O(rate x interval), independent of stream length. Both sides shuffle by
the join key (hash partitioned), so the join itself is local per task;
at 100 TB/day the state store (RocksDB in cluster deployments) holds
only the watermark window, not history.

`interval_join` works identically on BATCH frames (`withWatermark` is a
no-op there) — the registry's batch query and its DuckDB oracle exercise
the same code path the streaming golden test runs under `readStream`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "INTERVAL 10 MINUTES",
    watermark_delay: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` and ``right`` on ``key`` where
    ``left_ts <= right_ts <= left_ts + upper``.

    Column names (other than ``key``) must be disjoint between the two
    sides; the caller selects/aliases before joining — the engine never
    guesses at renames. For streaming inputs, pass both frames already
    carrying event-time columns; watermarks are applied here so state
    eviction is always configured (an unwatermarked stream-stream join
    grows state without bound, which Spark rejects for outer joins and
    quietly never evicts for inner — the hazard this wrapper closes).

    ``how``: "inner", "leftOuter", "rightOuter", or "fullOuter" — the
    outer types emit unmatched rows (null-padded on the other side) once
    the watermark passes their interval, per Structured Streaming
    semantics.
    """
    if how not in ("inner", "leftOuter", "rightOuter", "fullOuter"):
        raise ValueError(f"unsupported stream-stream join type: {how}")
    lw = left.withWatermark(left_ts, watermark_delay).alias("l")
    rw = right.withWatermark(right_ts, watermark_delay).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(upper))
    )
    joined = lw.join(rw, cond, how)
    # surface one copy of the key (coalesced — a right-only row under
    # rightOuter/fullOuter carries it only on the right side); keep both
    # event-time columns
    key_out = (
        F.col(f"l.{key}")
        if how in ("inner", "leftOuter")
        else F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}"))
    )
    return joined.select(
        key_out.alias(key),
        *[F.col(f"l.{c}") for c in left.columns if c != key],
        *[F.col(f"r.{c}") for c in right.columns if c != key],
    )
