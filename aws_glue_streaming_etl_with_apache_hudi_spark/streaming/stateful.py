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
