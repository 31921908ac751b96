"""Commit-coordination seam: the ONE primitive between the merge sink
and the storage system's atomic-swap facility.

The sink's commit protocol is optimistic (heavy Spark output stages in
uniquely-named dirs first), ending in a tiny critical section::

    token = backend.acquire()      # mutual exclusion begins
    cur   = load_root()            # read CURRENT pointer
    new   = build(cur)             # REBASE this commit's metadata on it
    swap(new)                      # atomic pointer write
    backend.release(token)         # mutual exclusion ends

``CommitBackend`` owns only acquire/release; the rebase and swap stay
in the sink. That is exactly the shape object-store catalogs expose:

- **LockfileCommitBackend** (default): ``O_CREAT|O_EXCL`` lockfile with
  an ownership token — correct on any POSIX shared filesystem (the
  local[32] and NFS/HDFS deployment story).
- An **Iceberg/Glue/DynamoDB catalog** implements the same two methods
  with a conditional put of a lease item (acquire = put-if-absent with
  TTL, release = delete-if-token-matches) — the pattern Delta's S3
  multi-cluster LogStore uses. Nothing outside this class changes.
- **InMemoryCASBackend** (tests): emulates such a catalog's
  conditional-put semantics in-process, proving the seam's contract
  without a network.

Reference parity note: the reference replicator needs no commit
coordination at all — its sink is a database that serializes writers
internally (scylla-cdc-replicator Main.java:674-683). A lake sink must
supply that serialization itself; this module is where.

Crash-safety / ownership hazards handled here (round-5 ADVICE):

* release verifies OWNERSHIP: the lock is renamed aside and its token
  compared before the file is permanently removed, so a holder whose
  lock was broken (it stalled past ``timeout_s``) can never delete the
  NEW holder's lock. A detected break raises ``CommitLockBroken`` so
  the caller knows its just-finished critical section may have raced.
* breaking a stale lock re-stats age IMMEDIATELY before the rename and
  verifies post-rename that the renamed file carries the token it
  judged stale; if a fresh holder slipped into the stat→rename window,
  the fresh lock is restored via ``os.link`` (which refuses to clobber
  a third acquirer).
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time
import uuid


class CommitLockBroken(RuntimeError):
    """The critical section outlived the lock: another process judged
    our lock stale and broke it, so our load→build→swap may have
    interleaved with theirs. The swap itself is an atomic
    ``os.replace`` (no torn file), but one of the two commits' metadata
    may have been clobbered — the caller should re-verify or retry."""


class CommitBackend:
    """Abstract acquire/release pair. Contract: between ``acquire()``
    returning and ``release(token)``, no other ``acquire()`` on the
    same table (ANY process) may return. Implementations may presume a
    holder dead after a timeout; ``release`` must then detect the break
    and raise ``CommitLockBroken`` rather than silently disturb the
    new holder."""

    def acquire(self) -> str:
        raise NotImplementedError

    def release(self, token: str) -> None:
        raise NotImplementedError

    @contextlib.contextmanager
    def held(self):
        token = self.acquire()
        try:
            yield
        finally:
            self.release(token)


class LockfileCommitBackend(CommitBackend):
    """O_EXCL lockfile with ownership tokens (default backend).

    The lockfile carries ``{"pid", "ts", "token"}``. Staleness is
    judged by mtime AND re-verified by the renamed file's content, so
    the only residual unsafety window is a holder that stalls longer
    than ``timeout_s`` *and* a release/re-acquire landing inside the
    microsecond stat→rename gap — at which point the displaced fresh
    lock is restored via ``os.link``. A catalog CAS backend has no
    such window; this is as strong as plain POSIX files get."""

    def __init__(self, lock_path: str, timeout_s: float = 60.0):
        self.lock_path = lock_path
        self.timeout_s = timeout_s

    def acquire(self) -> str:
        token = uuid.uuid4().hex
        payload = json.dumps(
            {"pid": os.getpid(), "ts": time.time(), "token": token}
        ).encode()
        deadline = time.time() + self.timeout_s + 10.0
        while True:
            try:
                fd = os.open(self.lock_path,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, payload)
                os.close(fd)
                return token
            except FileExistsError:
                pass
            holder = self._read(self.lock_path)
            # re-stat IMMEDIATELY before deciding to break: a lock
            # released and re-acquired since our last look must be seen
            # as fresh here, not broken on a stale observation
            try:
                age = time.time() - os.path.getmtime(self.lock_path)
            except OSError:
                continue  # released between open and stat — retry now
            if age > self.timeout_s:
                # crashed holder: break by RENAME, not remove — two
                # breakers racing on remove could each delete the
                # OTHER's freshly created lock. Rename succeeds for
                # exactly one breaker; the loser loops.
                stale = self.lock_path + f".stale.{uuid.uuid4().hex}"
                try:
                    os.rename(self.lock_path, stale)
                except OSError:
                    continue  # someone else broke or released it
                got = self._read(stale)
                if got is not None and (
                    time.time() - float(got.get("ts", 0)) <= self.timeout_s
                    or (holder is not None
                        and got.get("token") != holder.get("token"))
                ):
                    # the renamed file is NOT the lock we judged stale
                    # (a fresh holder slipped into the stat->rename
                    # window): restore it. link() refuses to clobber if
                    # a third process acquired meanwhile.
                    with contextlib.suppress(OSError):
                        os.link(stale, self.lock_path)
                with contextlib.suppress(OSError):
                    os.remove(stale)
                continue
            if time.time() > deadline:
                raise TimeoutError(
                    f"commit lock held beyond {self.timeout_s}s: "
                    f"{self.lock_path} (holder: {holder})"
                )
            time.sleep(0.02)

    def release(self, token: str) -> None:
        # rename-verify-remove: never permanently delete a lock whose
        # token we have not confirmed post-rename is ours
        tmp = self.lock_path + f".rel.{uuid.uuid4().hex}"
        try:
            os.rename(self.lock_path, tmp)
        except OSError:
            # lock file gone entirely: broken AND already cleaned up
            raise CommitLockBroken(
                f"commit lock {self.lock_path} disappeared while held "
                f"(token {token}): critical section may have raced"
            ) from None
        got = self._read(tmp)
        if got is not None and got.get("token") == token:
            with contextlib.suppress(OSError):
                os.remove(tmp)
            return
        # not ours: a breaker took our lock and a NEW holder owns the
        # path now — put their lock back and report the break
        with contextlib.suppress(OSError):
            os.link(tmp, self.lock_path)
        with contextlib.suppress(OSError):
            os.remove(tmp)
        raise CommitLockBroken(
            f"commit lock {self.lock_path} was broken while held "
            f"(our token {token}, found {got}): critical section may "
            f"have raced"
        )

    @staticmethod
    def _read(path: str) -> dict | None:
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None


class InMemoryCASBackend(CommitBackend):
    """Catalog-CAS emulation for tests: acquire = conditional put of a
    lease row (put-if-absent-or-expired under one atomic compare), the
    DynamoDB/Iceberg-REST pattern. Shared across threads of one
    process; proves the sink works against a non-filesystem backend."""

    def __init__(self, timeout_s: float = 60.0):
        self.timeout_s = timeout_s
        self._mu = threading.Lock()      # stands in for the store's CAS
        self._row: dict | None = None    # {"token", "ts"}
        self.acquires = 0
        self.breaks = 0

    def acquire(self) -> str:
        token = uuid.uuid4().hex
        deadline = time.time() + self.timeout_s + 10.0
        while True:
            with self._mu:  # one atomic conditional-put
                now = time.time()
                if self._row is None:
                    self._row = {"token": token, "ts": now}
                    self.acquires += 1
                    return token
                if now - self._row["ts"] > self.timeout_s:
                    self._row = {"token": token, "ts": now}  # TTL expiry
                    self.acquires += 1
                    self.breaks += 1
                    return token
            if time.time() > deadline:
                raise TimeoutError("commit lease held beyond timeout")
            time.sleep(0.005)

    def release(self, token: str) -> None:
        with self._mu:  # delete-if-token-matches
            if self._row is not None and self._row["token"] == token:
                self._row = None
                return
            found = self._row
        raise CommitLockBroken(
            f"commit lease was broken while held (our token {token}, "
            f"found {found})"
        )
