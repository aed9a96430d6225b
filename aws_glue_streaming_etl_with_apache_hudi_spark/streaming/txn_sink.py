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

The marker write is PLUGGABLE (VERDICT r5 task 2) because "create this
file if and only if it does not exist" has a different atomic primitive
per store:

- ``ExclMarkerWriter`` — POSIX ``O_CREAT|O_EXCL``; local disk and any
  filesystem with POSIX open semantics.
- ``StagedRenameMarkerWriter`` — write the marker body to a uniquely
  named staging file, fsync it, then ``os.link`` it onto the final
  marker name. Link-onto-target is the rename-family primitive that
  FAILS when the target exists (HDFS ``rename``/``createNewFile``, NFS
  lock files, ABFS rename-no-overwrite all behave this way), so it
  keeps the exactly-one-winner property WITHOUT ``O_EXCL``. A crash
  between stage and link leaves only an orphaned staging file that
  ``fsck()`` sweeps; the live marker is never half-written because it
  only ever appears via the atomic link.
- an S3-style store would implement ``MarkerWriter`` with a conditional
  PUT (``If-None-Match: *``) — same contract, same ledger semantics.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Callable
from typing import Protocol

from pyspark.sql import DataFrame

_STAGING_INFIX = ".staging-"


class MarkerWriter(Protocol):
    """Atomically create ``path``; True iff THIS attempt created it."""

    def write(self, path: str) -> bool: ...


class ExclMarkerWriter:
    """POSIX ``O_CREAT|O_EXCL`` — first creator wins, losers see
    ``FileExistsError``."""

    def write(self, path: str) -> bool:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        os.close(fd)
        return True


class StagedRenameMarkerWriter:
    """Stage-and-rename: durable staging file, then an atomic
    no-overwrite move onto the marker name. ``os.link`` is that move on
    POSIX (it fails with ``FileExistsError`` when the target exists,
    exactly like HDFS ``rename`` returning false) — no ``O_EXCL`` on
    the final path is ever used."""

    _MAX_RESTAGE = 16  # concurrent-fsck sweeps between stage and link

    def write(self, path: str) -> bool:
        # A concurrent fsck() may sweep the staging file between the
        # stage and the link (it cannot tell an orphan from an in-flight
        # write). That is not a lost race for the MARKER — the link never
        # happened — so the correct response is to re-stage and retry,
        # not to crash commit(). The finally-unlink likewise tolerates
        # the file having been swept for us.
        for _ in range(self._MAX_RESTAGE):
            staged = f"{path}{_STAGING_INFIX}{uuid.uuid4().hex}"
            with open(staged, "w") as f:
                f.write(os.path.basename(path))
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(staged, path)
                return True
            except FileExistsError:
                return False
            except FileNotFoundError:
                continue  # staging swept mid-flight: stage again
            finally:
                try:
                    os.unlink(staged)
                except FileNotFoundError:
                    pass
        raise RuntimeError(
            f"marker stage for {path} swept {self._MAX_RESTAGE} times in a "
            "row — an fsck loop is running concurrently with commits; run "
            "fsck() quiesced instead"
        )


class BatchIdLedger:
    """Durable has-this-batch-run set for foreachBatch side effects."""

    def __init__(self, path: str, marker_writer: MarkerWriter | None = None):
        self.path = path
        self.writer: MarkerWriter = marker_writer or ExclMarkerWriter()
        os.makedirs(path, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.path, f"batch-{batch_id}.done")

    def committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def commit(self, batch_id: int) -> bool:
        """Record ``batch_id``; returns False if another attempt already
        did (exactly one winner per id, whichever writer backs it)."""
        return self.writer.write(self._marker(batch_id))

    def fsck(self) -> list[str]:
        """Remove orphaned staging files (crash between stage and move).
        Marker CORRECTNESS is never at risk — a staging file is never the
        live marker — but fsck cannot distinguish an orphan from a
        concurrent in-flight ``StagedRenameMarkerWriter.write``; sweeping
        the latter's staging file forces that writer to re-stage (it
        retries transparently). Prefer running fsck quiesced, like the
        storage services' fsck. Returns the removed names."""
        removed = []
        for name in os.listdir(self.path):
            if _STAGING_INFIX in name:
                os.unlink(os.path.join(self.path, name))
                removed.append(name)
        return removed

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
