"""Optimistic concurrency control for table commits.

Hudi guards multi-writer tables with a lock provider around the commit
critical section (``hoodie.write.concurrency.mode=optimistic_
concurrency_control``); the reference sidesteps the problem by pinning
``MaxConcurrentRuns: 1`` (Glue_StreamingJob_Hudi_Template.yaml:282-285).
This module is the engine's lock provider: an exclusive on-disk lock
taken around a table's commit section so two writers cannot interleave
read-merge-write cycles and lose updates.

``O_CREAT | O_EXCL`` file creation is atomic on POSIX local filesystems
(and HDFS ``create(overwrite=false)`` has the same contract — the
cluster swap-in, like every other local-FS touchpoint in this package).
A crashed writer leaves a stale lock; ``ttl_s`` lets the next writer
break locks older than the longest plausible commit.
"""

from __future__ import annotations

import os
import time


class CommitLockTimeout(RuntimeError):
    pass


class CommitLock:
    """Exclusive commit lock for a table path (context manager).

    ``timeout_s``  how long to wait for the lock before raising.
    ``ttl_s``      age after which a held lock is considered abandoned
                   and broken (crashed writer).
    """

    def __init__(
        self,
        table_path: str,
        timeout_s: float = 60.0,
        ttl_s: float = 3600.0,
        poll_s: float = 0.1,
    ) -> None:
        self.lock_path = os.path.join(table_path, "_commit.lock")
        self.timeout_s = timeout_s
        self.ttl_s = ttl_s
        self.poll_s = poll_s
        self._fd: int | None = None

    def _try_acquire(self) -> bool:
        os.makedirs(os.path.dirname(self.lock_path), exist_ok=True)
        try:
            self._fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(self._fd, f"{os.getpid()} {time.time()}".encode())
            return True
        except FileExistsError:
            return False

    def _break_if_stale(self) -> None:
        try:
            age = time.time() - os.path.getmtime(self.lock_path)
            if age > self.ttl_s:
                os.remove(self.lock_path)
        except FileNotFoundError:
            pass

    def __enter__(self) -> "CommitLock":
        deadline = time.monotonic() + self.timeout_s
        while True:
            if self._try_acquire():
                return self
            self._break_if_stale()
            if time.monotonic() >= deadline:
                raise CommitLockTimeout(
                    f"could not acquire {self.lock_path} within {self.timeout_s}s"
                )
            time.sleep(self.poll_s)

    def __exit__(self, *exc) -> None:
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None
        try:
            os.remove(self.lock_path)
        except FileNotFoundError:
            pass
