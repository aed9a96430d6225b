"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic event generator, batch AND streaming.

Why this exists: the reference's stream table is fed by an external
generator script (Kinesis/Kafka producer). Spark 4's Python DataSource
API lets the engine carry its own load generator as a first-class
``spark.read.format(...)`` / ``spark.readStream.format(...)`` source —
no broker, no files, usable for soak tests, throughput probes
(BASELINE.md's 1k records/s/shard comparisons), and demoing the pipeline
without fixture parquet.

Determinism contract: every field derives from md5(seed, row-index) —
the same (rows, seed) options produce byte-identical frames regardless
of partition count, executor placement, or retries (a retried task
regenerates exactly its partition's rows). This is what makes the
generator usable in tests and makes speculative execution safe.

Scale shape: ``numPartitions`` input splits generate independently from
pure row-index ranges — no coordination, no state, linear scaling; the
stream reader hands out offset ranges the same way (rows are the offset,
so exactly-once replay after checkpoint recovery is the identity).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql import types as T

_EVENT_TYPES = ["view", "click", "purchase", "refund", "login"]
_BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _h(seed: str, i: int, field: str) -> int:
    """60-bit deterministic hash for row ``i``'s ``field`` (the same
    md5-derived family as functions/hashing.py, driver/executor-safe)."""
    d = hashlib.md5(f"{seed}|{i}|{field}".encode()).hexdigest()
    return int(d[:15], 16)


def _row(seed: str, i: int, n_users: int) -> tuple:
    ts = _BASE_TS + timedelta(seconds=(_h(seed, i, "ts") % (30 * 24 * 3600)))
    return (
        i,
        ts.replace(tzinfo=None),
        _h(seed, i, "user") % n_users,
        _EVENT_TYPES[_h(seed, i, "type") % len(_EVENT_TYPES)],
        round((_h(seed, i, "value") % 100000) / 100.0, 2),
        "{}",
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class GraftEventsDataSource(DataSource):
    """``format("graft_events")`` — options:

    - ``rows``          total rows (batch) / rows already emittable (stream
                        advances by ``rowsPerBatch`` per trigger)
    - ``numPartitions`` parallel generator splits (default 4)
    - ``seed``          hash-family salt (default "graft")
    - ``numUsers``      user-id cardinality (default 100)
    - ``rowsPerBatch``  stream: rows released per micro-batch (default 100)
    """

    @classmethod
    def name(cls) -> str:
        return "graft_events"

    def schema(self):
        return T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        )

    def reader(self, schema) -> "GraftEventsReader":
        return GraftEventsReader(self.options)

    def streamReader(self, schema) -> "GraftEventsStreamReader":
        return GraftEventsStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "GraftLedgerWriter":
        return GraftLedgerWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "GraftLedgerStreamWriter":
        return GraftLedgerStreamWriter(self.options)


class GraftEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("numPartitions", 4)))
        self.seed = options.get("seed", "graft")
        self.n_users = max(1, int(options.get("numUsers", 100)))

    def partitions(self):
        step = -(-self.rows // self.n_parts)  # ceil
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(self.seed, i, self.n_users)


class GraftEventsStreamReader(DataSourceStreamReader):
    """Offset = next row index to generate. Each trigger releases up to
    ``rowsPerBatch`` more rows (capped at ``rows``); replaying a
    committed range regenerates the identical rows — exactly-once by
    construction."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.per_batch = max(1, int(options.get("rowsPerBatch", 100)))
        self.n_parts = max(1, int(options.get("numPartitions", 4)))
        self.seed = options.get("seed", "graft")
        self.n_users = max(1, int(options.get("numUsers", 100)))

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        # advance one batch per call, never past the configured cap
        cur = getattr(self, "_cur", 0)
        nxt = min(cur + self.per_batch, self.rows)
        self._cur = nxt
        return {"index": nxt}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["index"], end["index"]
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        step = -(-(hi - lo) // self.n_parts)
        return [
            _RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(self.seed, i, self.n_users)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — regeneration is the recovery story


class _StagedFile(WriterCommitMessage):
    """Per-task commit message: the staged file this task produced."""

    def __init__(self, staged: str, rows: int):
        self.staged, self.rows = staged, rows


class GraftLedgerWriter(DataSourceWriter):
    """Write side of the DataSource API (``df.write.format("graft_events")
    .option("path", ...)``): a JSONL ledger sink with the standard
    two-phase task-commit protocol, exercised end to end in Python.

    - ``write`` (executor, per task): rows stream to a STAGING file named
      by (partition, taskAttempt) — flushed and fsynced — and the task's
      commit message carries that path. A speculative or retried attempt
      stages its own file; losers are simply never promoted.
    - ``commit`` (driver, once, only if every task succeeded): each staged
      file is renamed into the final directory and a ``_SUCCESS`` manifest
      lists the promoted files — readers that honor the manifest never see
      a torn write.
    - ``abort``: staged files of the failed job are removed.

    This is the same protocol a production sink uses against an object
    store (staging keys + manifest swap); here it is local-FS rename,
    like every other storage service in the repo. Scale: tasks write
    independently (no coordination until the O(#tasks) driver commit)."""

    def __init__(self, options, overwrite: bool):
        import uuid as _uuid

        path = options.get("path")
        if not path:
            raise ValueError("graft_events writer requires option 'path'")
        self.path = path
        self.overwrite = overwrite
        # Driver-minted job token, shared by every task via serialization:
        # final file names are unique PER JOB, so promoting this job's
        # files can never overwrite a file a previous _SUCCESS still
        # references (the overwrite crash-safety below depends on it).
        self.job_token = _uuid.uuid4().hex[:8]

    def write(self, iterator):
        import json as _json
        import os as _os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        name = (
            f"part-{ctx.partitionId():05d}-{ctx.taskAttemptId()}"
            f"-{self.job_token}.jsonl"
        )
        staging = _os.path.join(self.path, "_staging")
        _os.makedirs(staging, exist_ok=True)
        staged = _os.path.join(staging, name)
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
            f.flush()
            _os.fsync(f.fileno())
        return _StagedFile(staged, n)

    def commit(self, messages):
        # Crash-safe ordering (ADVICE r6): promote FIRST, swap the new
        # _SUCCESS second, delete superseded files LAST. At every crash
        # point the live manifest references only intact files — a crash
        # mid-promote leaves the old manifest authoritative with this
        # job's files unreferenced, a crash before the old-file sweep
        # leaves the new manifest authoritative with the old files
        # unreferenced; ledger_fsck() reclaims either orphan set. The
        # job-token file names guarantee a promote never clobbers a file
        # the old manifest still lists.
        import json as _json
        import os as _os

        _os.makedirs(self.path, exist_ok=True)
        final_names, rows = [], 0
        for m in messages:
            if m is None:
                continue
            dest = _os.path.join(self.path, _os.path.basename(m.staged))
            _os.replace(m.staged, dest)
            final_names.append(_os.path.basename(dest))
            rows += m.rows
        success = _os.path.join(self.path, "_SUCCESS")
        prev_files: list = []
        prev_rows = 0
        if not self.overwrite and _os.path.exists(success):
            with open(success) as f:
                prev = _json.load(f)
            prev_files, prev_rows = prev.get("files", []), prev.get("rows", 0)
        tmp = success + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(
                {
                    "files": sorted(set(prev_files) | set(final_names)),
                    "rows": prev_rows + rows,
                },
                f,
            )
        _os.replace(tmp, success)
        if self.overwrite:
            keep = set(final_names)
            for old in _os.listdir(self.path):
                if old.endswith(".jsonl") and old not in keep:
                    _os.remove(_os.path.join(self.path, old))

    def abort(self, messages):
        import os as _os

        for m in messages:
            if m is not None and _os.path.exists(m.staged):
                _os.remove(m.staged)


class GraftLedgerStreamWriter(DataSourceStreamWriter):
    """Streaming write side (``df.writeStream.format("graft_events")``):
    the same staged-file protocol as the batch writer, with the commit
    keyed by MICRO-BATCH id — each batch's files promote under a
    ``_batch_N`` manifest written atomically, so a restart that replays
    batch N (offsets checkpointed, effects not yet manifest) simply
    re-stages and re-promotes the SAME manifest name: exactly-once by
    idempotent rename, the BatchIdLedger contract expressed inside the
    DataSource API instead of foreachBatch."""

    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("graft_events stream writer requires option 'path'")
        self.path = path

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        name = f"stage-{ctx.partitionId():05d}-{ctx.taskAttemptId()}-{_uuid.uuid4().hex[:8]}.jsonl"
        staging = _os.path.join(self.path, "_staging")
        _os.makedirs(staging, exist_ok=True)
        staged = _os.path.join(staging, name)
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
            f.flush()
            _os.fsync(f.fileno())
        return _StagedFile(staged, n)

    def commit(self, messages, batchId: int) -> None:
        import json as _json
        import os as _os

        manifest_path = _os.path.join(self.path, f"_batch_{batchId}")
        if _os.path.exists(manifest_path):
            # replayed batch already committed: drop the re-staged files
            self.abort(messages, batchId)
            return
        _os.makedirs(self.path, exist_ok=True)
        # No manifest yet means NO prior attempt for this batch committed
        # — any batch-N-* files already present are a crashed attempt's
        # half-promoted leftovers (replays re-stage under fresh uuid
        # names, so they would otherwise accrete forever). Sweep them
        # before promoting so the manifest written below lists exactly
        # this attempt's files (ADVICE r6).
        stale_prefix = f"batch-{batchId}-"
        for name in _os.listdir(self.path):
            if name.startswith(stale_prefix) and name.endswith(".jsonl"):
                _os.remove(_os.path.join(self.path, name))
        final_names, rows = [], 0
        for m in messages:
            if m is None:
                continue
            dest = _os.path.join(
                self.path, f"batch-{batchId}-{_os.path.basename(m.staged)}"
            )
            _os.replace(m.staged, dest)
            final_names.append(_os.path.basename(dest))
            rows += m.rows
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"batch": batchId, "files": sorted(final_names), "rows": rows}, f)
        _os.replace(tmp, manifest_path)

    def abort(self, messages, batchId: int) -> None:
        import os as _os

        for m in messages:
            if m is not None and _os.path.exists(m.staged):
                _os.remove(m.staged)


def ledger_fsck(path: str) -> dict:
    """Reclaim a ledger directory's crash residue (offline-only, like
    every storage-service fsck in the repo): ``.jsonl`` files referenced
    by neither the ``_SUCCESS`` manifest nor any ``_batch_N`` manifest
    (half-promoted batch-writer attempts, overwrite-superseded files the
    commit crashed before sweeping), orphaned ``_staging`` files (lost
    speculative task attempts), and torn ``*.tmp`` manifests. Never
    touches a manifest-listed file, so a consistent directory is a
    no-op. Returns the removed names by category."""
    import json as _json
    import os as _os

    removed: dict = {"orphans": [], "staging": [], "tmp": []}
    if not _os.path.isdir(path):
        return removed
    referenced: set = set()
    for name in _os.listdir(path):
        if name == "_SUCCESS" or (
            name.startswith("_batch_") and not name.endswith(".tmp")
        ):
            with open(_os.path.join(path, name)) as f:
                referenced.update(_json.load(f).get("files", []))
    for name in sorted(_os.listdir(path)):
        full = _os.path.join(path, name)
        if name.endswith(".jsonl") and name not in referenced:
            _os.remove(full)
            removed["orphans"].append(name)
        elif name.endswith(".tmp"):
            _os.remove(full)
            removed["tmp"].append(name)
    staging = _os.path.join(path, "_staging")
    if _os.path.isdir(staging):
        for name in sorted(_os.listdir(staging)):
            _os.remove(_os.path.join(staging, name))
            removed["staging"].append(name)
    return removed


def register(spark) -> None:
    """Register the source on a session: ``register(spark)`` then
    ``spark.read.format("graft_events")...``."""
    spark.dataSource.register(GraftEventsDataSource)
