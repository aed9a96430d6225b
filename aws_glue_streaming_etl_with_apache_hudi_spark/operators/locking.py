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

Stale-lock breaking is race-safe: the breaker first atomically RENAMES
the stale lock to a unique victim path and only then deletes the victim.
``os.rename`` of an existing source succeeds for exactly one concurrent
breaker (the losers get ``FileNotFoundError``), and a fresh lock created
at ``lock_path`` between staleness-check and break is never touched —
the rename source is gone; restores after a mistaken break go through
``os.link`` (no-clobber) so a lock a third writer acquired meanwhile is
never replaced. Release renames the lock to a private path and verifies
the owner token INSIDE the renamed file (atomic take, no check-then-
delete window), so a writer whose lock was broken while it (over-)ran
its critical section cannot delete a successor's lock.
"""

from __future__ import annotations

import os
import time
import uuid


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
        # Unique per-acquisition owner token; lets release verify the lock
        # on disk is still *ours* before deleting it.
        self._token = f"{os.getpid()}:{uuid.uuid4().hex}"

    def _try_acquire(self) -> bool:
        os.makedirs(os.path.dirname(self.lock_path), exist_ok=True)
        try:
            self._fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(self._fd, f"{self._token} {time.time()}".encode())
            os.fsync(self._fd)
            return True
        except FileExistsError:
            return False

    def _break_if_stale(self) -> None:
        """Break an abandoned lock without ever deleting a fresh one.

        Two waiters may both observe staleness; deleting ``lock_path``
        directly would let the slower waiter remove a lock the faster one
        just (re-)acquired (the round-1 TOCTOU). Renaming the victim to a
        unique path first makes the break atomic: exactly one renamer
        wins, and the winner deletes only the renamed file.
        """
        try:
            age = time.time() - os.path.getmtime(self.lock_path)
        except OSError:
            return  # gone already — someone else broke or released it
        if age <= self.ttl_s:
            return
        victim = f"{self.lock_path}.broken.{os.getpid()}.{uuid.uuid4().hex}"
        try:
            os.rename(self.lock_path, victim)
        except OSError:
            return  # lost the rename race — another breaker got it
        # Re-check the *renamed* file really was stale: if a fresh lock was
        # created between getmtime and rename, its mtime proves it and it
        # must be put back. The restore must NOT clobber: a third writer may
        # have acquired a brand-new lock at lock_path after our rename-away,
        # and a plain rename-back would silently replace it (two writers in
        # the critical section). os.link is the no-clobber primitive — it
        # fails with FileExistsError when a new lock exists, in which case
        # the displaced owner's release is already protected by its token
        # check and the victim is simply dropped.
        try:
            stale = time.time() - os.path.getmtime(victim) > self.ttl_s
        except OSError:
            return
        if not stale:
            try:
                os.link(victim, self.lock_path)
            except OSError:
                pass  # FileExistsError: a new owner holds lock_path — keep it
        try:
            os.remove(victim)
        except OSError:
            pass

    def _owns_lock_on_disk(self) -> bool:
        try:
            with open(self.lock_path, "rb") as fh:
                return fh.read().decode(errors="replace").split(" ")[0] == self._token
        except OSError:
            return False

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
        # Release by rename-then-verify, not check-then-delete: between an
        # ownership check and os.remove the lock could be broken as stale
        # and reacquired, making the remove delete the successor's lock.
        # A lock that already reads as NOT ours is never renamed at all —
        # renaming would open a vacancy window at lock_path in which a
        # third waiter could acquire while a successor still holds the
        # displaced file. Only an apparently-ours lock is renamed to a
        # private path; the token is then re-verified INSIDE the renamed
        # file (the break-and-reacquire race between check and rename is
        # what the second verify catches), and a mistakenly displaced
        # successor lock is restored with the same no-clobber link
        # primitive _break_if_stale uses. The residual unrecoverable case
        # (successor displaced AND a third writer acquired before the
        # restore) requires our lock to have crossed the TTL in that
        # instant — the same presumed-dead contract stale breaking
        # already accepts.
        if not self._owns_lock_on_disk():
            return  # broken/replaced while we overran — nothing of ours
        private = f"{self.lock_path}.release.{os.getpid()}.{uuid.uuid4().hex}"
        try:
            os.rename(self.lock_path, private)
        except OSError:
            return  # lock already broken/released — nothing of ours on disk
        try:
            with open(private, "rb") as fh:
                mine = fh.read().decode(errors="replace").split(" ")[0] == self._token
        except OSError:
            mine = False  # unreadable -> treat as foreign: restore, don't strand
        if not mine:
            try:
                os.link(private, self.lock_path)
            except OSError:
                pass  # FileExistsError: an even newer owner appeared — keep it
        try:
            os.remove(private)
        except OSError:
            pass
