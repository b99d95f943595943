"""Single-writer branch locks (reference ``muller/core/lock/file_lock.py``,
``persistent.py``; protected commit/checkout at
``muller/core/version_control/operations/commits.py:403,143``).

The reference serializes writers per branch with file (or Redis) locks so
two sessions can't both advance one branch ref.  Here the same contract
is a lease file next to the commit log:

    <root>/_log/locks/<branch>.lock   →  {"owner", "pid", "acquired_at", "ttl"}

- **Atomic acquisition** via ``O_CREAT | O_EXCL`` — a filesystem-level
  compare-and-swap, safe for concurrent local processes and for object
  stores with if-none-match semantics (documented assumption: the log
  lives on a filesystem with atomic exclusive create; see SURVEY §1.3).
- **Leases, not permanent locks**: a crashed writer's lock is reclaimable
  once older than its TTL (the reference's persistent-lock staleness
  check).  Re-acquisition by the same owner is idempotent (re-entrant).
- Spark executors never touch locks — only the driver-side commit path
  does, so lock traffic is O(commits), irrelevant at any data scale.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from muller_spark.errors import MullerSparkError

DEFAULT_TTL_SECONDS = 600.0

# a crashed mid-takeover marker (<branch>.lock.takeover) is itself
# reclaimable after this many seconds
_TAKEOVER_TTL_SECONDS = 10.0


class BranchLockedError(MullerSparkError):
    """Another writer holds the branch lease."""


class BranchLock:
    """Context-managed exclusive lease on one branch of one dataset log."""

    def __init__(
        self,
        log_dir: str,
        branch: str,
        owner: str | None = None,
        ttl: float = DEFAULT_TTL_SECONDS,
        timeout: float = 0.0,
        poll_interval: float = 0.1,
    ) -> None:
        self.lock_dir = os.path.join(log_dir, "locks")
        self.path = os.path.join(self.lock_dir, f"{branch}.lock")
        self.branch = branch
        self.owner = owner or f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
        self.ttl = ttl
        self.timeout = timeout
        self.poll_interval = poll_interval
        self._held = False

    # -- inspection --------------------------------------------------------
    def holder(self) -> dict | None:
        """The current lease record, or None if unlocked/corrupt."""
        try:
            with open(self.path) as fh:
                return json.loads(fh.read())
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _is_stale(self, record: dict) -> bool:
        age = time.time() - float(record.get("acquired_at", 0))
        return age > float(record.get("ttl", self.ttl))

    # -- acquisition -------------------------------------------------------
    def acquire(self) -> "BranchLock":
        os.makedirs(self.lock_dir, exist_ok=True)
        deadline = time.monotonic() + self.timeout
        while True:
            if self._try_acquire():
                self._held = True
                return self
            record = self.holder()
            if record is None:
                continue  # holder released between probe and read
            if record.get("owner") == self.owner:
                # re-entrant same-owner: our own fresh record is never a
                # steal target, so removing it is safe; tolerate a
                # concurrent release from another thread of this owner
                try:
                    os.remove(self.path)
                except FileNotFoundError:
                    pass
                continue
            if self._is_stale(record):
                # expired lease: steal it atomically, then loop back and
                # COMPETE via _try_acquire — never assume the steal won
                self._steal_stale(record)
                continue
            if time.monotonic() >= deadline:
                raise BranchLockedError(
                    f"branch {self.branch!r} is locked by {record.get('owner')!r} "
                    f"(acquired {time.time() - record.get('acquired_at', 0):.0f}s ago, "
                    f"ttl {record.get('ttl')}s)"
                )
            time.sleep(self.poll_interval)

    def _steal_stale(self, observed: dict) -> None:
        """Remove an expired lease without ever deleting a live one.

        The naive ``os.remove`` is racy: two waiters can both observe the
        stale record; after A removes it and re-acquires, B's remove
        deletes A's *fresh* lock and both end up holding.  Three guards
        close that:

        1. a ``.takeover`` marker (``O_CREAT|O_EXCL``) serializes
           stealers — only one process attempts a given steal;
        2. the lease is re-read under the marker and only stolen if it is
           byte-identical to the record we judged stale;
        3. the steal is a rename to a unique tombstone followed by an
           inode check — if the rename captured a different file than the
           one we verified (the narrowest release/re-acquire race), it is
           restored via ``os.link``, which refuses to clobber a
           re-created lock.

        After any outcome the caller loops back to ``_try_acquire`` and
        competes normally.
        """
        takeover = self.path + ".takeover"
        try:
            fd = os.open(takeover, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # another waiter is mid-takeover; reclaim its marker only if
            # it crashed (marker older than the takeover TTL)
            try:
                if time.time() - os.path.getmtime(takeover) > _TAKEOVER_TTL_SECONDS:
                    os.remove(takeover)
            except FileNotFoundError:
                pass
            return
        os.close(fd)
        try:
            try:
                stat_before = os.stat(self.path)
                with open(self.path) as fh:
                    current = json.loads(fh.read())
            except (FileNotFoundError, json.JSONDecodeError):
                return  # released or rewritten meanwhile — nothing to steal
            if current != observed or not self._is_stale(current):
                return  # lease changed hands since we judged it stale
            tomb = f"{self.path}.{uuid.uuid4().hex[:8]}.tomb"
            try:
                os.rename(self.path, tomb)
            except FileNotFoundError:
                return
            try:
                if os.stat(tomb).st_ino == stat_before.st_ino:
                    os.remove(tomb)  # captured exactly the stale file
                else:
                    # captured a freshly re-created lock: restore it
                    try:
                        os.link(tomb, self.path)
                    except FileExistsError:
                        pass
                    os.remove(tomb)
            except FileNotFoundError:
                pass
        finally:
            try:
                os.remove(takeover)
            except FileNotFoundError:
                pass

    def _try_acquire(self) -> bool:
        record = json.dumps({
            "owner": self.owner,
            "pid": os.getpid(),
            "branch": self.branch,
            "acquired_at": time.time(),
            "ttl": self.ttl,
        })
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(fd, record.encode())
        finally:
            os.close(fd)
        return True

    def release(self) -> None:
        if not self._held:
            return
        record = self.holder()
        if record is not None and record.get("owner") == self.owner:
            try:
                os.remove(self.path)
            except FileNotFoundError:
                pass
        self._held = False

    # -- context manager ---------------------------------------------------
    def __enter__(self) -> "BranchLock":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()
