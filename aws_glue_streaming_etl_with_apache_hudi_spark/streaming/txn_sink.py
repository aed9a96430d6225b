"""Exactly-once foreachBatch for NON-idempotent sinks: a batch-id ledger.

The pipeline's own sink (keyed upsert) is idempotent, so replays are
absorbed by merge semantics (streaming/pipeline.py). Sinks without a
natural merge key — plain appends, external POSTs, notification fan-out —
need the other standard mechanism: record the micro-batch id durably
AFTER the side effect succeeds, and skip any batch id already recorded.
Structured Streaming guarantees foreachBatch re-delivers the SAME batch
id with the SAME data on recovery, which turns at-least-once delivery
plus this ledger into exactly-once effects.

Crash-window analysis (the order is the point):
- crash before the side effect: replay re-runs it — nothing recorded;
- crash after the side effect but before the ledger write: replay
  re-runs the side effect — this is the at-least-once residue every
  external-effect system has; make the effect itself idempotent
  (deterministic object keys, request tokens) to close it, or write the
  effect and the marker to the same transactional store;
- crash after the ledger write: replay is skipped — exactly-once.

The ledger is one empty O_EXCL-created file per batch id — atomic on
POSIX, safe against the concurrent-replay race (two attempts of the same
batch can both pass the exists-check; only one wins the create)."""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


class BatchIdLedger:
    """Durable has-this-batch-run set for foreachBatch side effects."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.path, f"batch-{batch_id}.done")

    def committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def commit(self, batch_id: int) -> bool:
        """Record ``batch_id``; returns False if another attempt already
        did (O_EXCL — exactly one winner per id)."""
        try:
            fd = os.open(self._marker(batch_id), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        os.close(fd)
        return True

    def run_once(
        self,
        batch_df: DataFrame,
        batch_id: int,
        effect: Callable[[DataFrame], None],
    ) -> bool:
        """Apply ``effect`` to the batch unless this batch id already ran.
        Returns True when the effect executed. The intended foreachBatch
        body: ``lambda df, bid: ledger.run_once(df, bid, sink_fn)``."""
        if self.committed(batch_id):
            return False
        effect(batch_df)
        self.commit(batch_id)
        return True
