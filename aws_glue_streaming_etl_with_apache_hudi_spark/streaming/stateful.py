"""Custom stateful streaming operators via ``applyInPandasWithState`` —
the escape hatch for semantics the built-in windowed aggregations can't
express (per-key running state machines, custom eviction, cross-batch
counters).

Pattern notes (the part that transfers to 100 TB):

- State lives in Spark's state store keyed by the groupBy key; each
  micro-batch hands the operator only that batch's rows for keys present
  in the batch, plus the key's prior state.
- The state value must stay SMALL (counters, aggregates, bounded lists)
  — it is rewritten per batch per key.
- Timeouts bound state lifetime the way watermarks bound window state.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("batch_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _running_totals(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user lifetime event count + value sum, updated every batch."""
    n, total = state.get if state.exists else (0, 0.0)
    batch_n = 0
    for pdf in pdfs:
        batch_n += len(pdf)
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "batch_events": [batch_n],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals: emits one row per user per
    micro-batch with lifetime counters (update output mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# Session state machine with event-time timeout — the custom-eviction shape
# F.session_window cannot express: the session CLOSES (emits a final row)
# only when the watermark passes gap seconds beyond its last event, and the
# operator controls exactly what a closed session reports.

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def make_session_fn(gap_seconds: int):
    """Build the per-key session state machine (closure over the gap)."""

    def _sessions(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        gap_us = gap_seconds * 1_000_000

        def close(start_us, last_us, n, total):
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us + gap_us, unit="us")],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield close(start_us, last_us, n, total)
            return

        rows = pd.concat(list(pdfs))
        ts_us = rows["ts"].astype("datetime64[ns]").astype("int64") // 1_000
        order = ts_us.sort_values().index
        start_us, last_us, n, total = (
            state.get if state.exists else (None, None, 0, 0.0)
        )
        for i in order:
            t_us = int(ts_us[i])
            v = float(rows["value"][i])
            if start_us is None:
                start_us, last_us, n, total = t_us, t_us, 1, v
            elif t_us - last_us > gap_us:
                # gap INSIDE the batch: close the old session immediately
                yield close(start_us, last_us, n, total)
                start_us, last_us, n, total = t_us, t_us, 1, v
            else:
                last_us, n, total = max(last_us, t_us), n + 1, total + v
        state.update((start_us, last_us, n, total))
        # the session closes when the WATERMARK passes last_event + gap —
        # event-time timeout, the exact semantics session_window uses for
        # state eviction, but with the close row under our control
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)

    return _sessions


def session_state_machine(events: DataFrame, gap_seconds: int = 300) -> DataFrame:
    """Streaming sessionization as an explicit per-user state machine
    (``applyInPandasWithState`` + EventTimeTimeout): events extend the
    open session; a quiet gap inside a batch closes it inline; a quiet
    gap ACROSS batches closes it when the watermark passes last_event +
    gap (``state.hasTimedOut``). Emits only CLOSED sessions (append
    semantics) — the operator shape for custom session payloads
    (entry/exit pages, conversion flags) that ``F.session_window``'s
    fixed aggregate surface cannot carry.

    Scale: state is 4 scalars per open session per user; timeouts evict
    exactly like watermarked session windows; shuffles only on user_id.
    Requires ``withWatermark("ts", ...)`` upstream — the timeout clock
    IS the watermark."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# -- transformWithState (Spark 4 StatefulProcessor API) ----------------------
#
# The same session machine re-expressed on Spark 4's successor API
# (SPARK-46815 "Arbitrary State API v2"): named state variables instead of
# one opaque tuple, EXPLICIT timers instead of one timeout slot, and an
# operator object with a lifecycle instead of a closure. Differences that
# matter:
# - timers ACCUMULATE (registerTimer adds; setTimeoutTimestamp replaced),
#   so extending a session must deleteTimer the previous one — the timer
#   handle is therefore part of the session state;
# - a fired timer might still be stale if a same-batch input extended the
#   session after the timer was queued, so expiry re-checks against the
#   state's own close time before emitting.


from pyspark.sql.streaming.stateful_processor import StatefulProcessor  # noqa: E402


class SessionProcessor(StatefulProcessor):
    """Per-user gap-session state machine as a ``StatefulProcessor``.

    Emits only CLOSED sessions (append semantics), closing on an in-batch
    gap immediately and on a cross-batch gap when the event-time timer
    (watermark) passes last_event + gap — semantics identical to
    ``session_state_machine``; tests assert the two operators' closed
    session sets are equal on a replayed fixture."""

    def __init__(self, gap_seconds: int):
        self.gap_us = gap_seconds * 1_000_000
        self.gap_ms = gap_seconds * 1_000

    def init(self, handle) -> None:
        self.handle = handle
        self.state = handle.getValueState(
            "sess", "start_us LONG, last_us LONG, n LONG, total DOUBLE, timer_ms LONG"
        )

    def _close_frame(self, user_id, start_us, last_us, n, total):
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us + self.gap_us, unit="us")],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    def handleInputRows(self, key, rows, timerValues):
        # ignore_index: a key's batch may arrive as SEVERAL Arrow chunks,
        # each indexed 0..n-1 — concatenating labels as-is duplicates them
        # and scalar lookups (ts_us[i]) would return Series. Positional
        # iloc below keeps every access scalar regardless of chunking.
        batch = pd.concat(list(rows), ignore_index=True)
        ts_us = batch["ts"].astype("datetime64[ns]").astype("int64") // 1_000
        order = ts_us.sort_values().index
        prior = self.state.get() if self.state.exists() else None
        if prior is not None:
            start_us, last_us, n, total, old_timer = prior
        else:
            start_us = last_us = old_timer = None
            n, total = 0, 0.0
        for i in order:
            t_us = int(ts_us.iloc[i])
            v = float(batch["value"].iloc[i])
            if start_us is None:
                start_us, last_us, n, total = t_us, t_us, 1, v
            elif t_us - last_us > self.gap_us:
                yield self._close_frame(key[0], start_us, last_us, n, total)
                start_us, last_us, n, total = t_us, t_us, 1, v
            else:
                last_us, n, total = max(last_us, t_us), n + 1, total + v
        new_timer = last_us // 1_000 + self.gap_ms
        if old_timer is not None and old_timer != new_timer:
            self.handle.deleteTimer(old_timer)  # timers accumulate on this API
        self.handle.registerTimer(new_timer)
        self.state.update((start_us, last_us, n, total, new_timer))

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if not self.state.exists():
            return
        start_us, last_us, n, total, _timer = self.state.get()
        # stale-fire guard: only close if this expiry is the session's
        # CURRENT close time (an input that arrived after the timer was
        # queued extends the session and re-arms a later timer)
        if expiredTimerInfo.getExpiryTimeInMs() < last_us // 1_000 + self.gap_ms:
            return
        self.state.clear()
        yield self._close_frame(key[0], start_us, last_us, n, total)

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithState's state protocol speaks protobuf between the
    JVM and a Python state server; without the ``protobuf`` package the
    query crashes at schema validation. Probe once, skip cleanly — the
    multimodal decoder-registry pattern for env-blocked capability."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def session_state_machine_tws(events: DataFrame, gap_seconds: int = 300) -> DataFrame:
    """`session_state_machine` on the Spark 4 ``transformWithStateInPandas``
    API: named value state + explicit event-time timers. Requires
    ``withWatermark("ts", ...)`` upstream (the timer clock is the
    watermark, exactly like the EventTimeTimeout version) and, at
    runtime, the protobuf package (``tws_available()``; absent in this
    sandbox, so the end-to-end leg is capability-gated while the
    processor's session semantics are pinned to the EventTimeTimeout
    implementation by direct unit test).

    Scale: identical state footprint (5 scalars per open session); the
    state store, shuffle-on-key, and eviction story carry over — this
    exists so the engine tracks the API Spark is consolidating stateful
    pipelines on, with both implementations pinned equal by test."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionProcessor(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
