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

* release verifies OWNERSHIP twice: first in place (a lock that
  already carries another token is reported broken WITHOUT touching
  the file — no vacancy is ever created on the already-broken path),
  then by rename-aside + token compare before the permanent remove, so
  a holder whose lock was broken (it stalled past ``timeout_s``) can
  never delete the NEW holder's lock. A detected break raises
  ``CommitLockBroken`` so the caller knows its just-finished critical
  section may have raced.
* breaking a stale lock re-stats age IMMEDIATELY before the rename and
  verifies post-rename that the renamed file carries the token it
  judged stale; if a fresh holder slipped into the stat→rename window
  — or the renamed file is unreadable but YOUNG (an ``O_EXCL`` creator
  between its open and write) — the displaced lock is restored via
  ``os.link`` (which refuses to clobber a third acquirer).

Residual windows, acknowledged: between a restore's rename and its
link the path is briefly vacant, so a third acquirer polling in that
microsecond gap can slip in — the displaced holder then detects the
break at ITS release (token mismatch) and raises ``CommitLockBroken``,
so mutual exclusion is never violated silently. On filesystems without
hard links (some FUSE/object-store mounts) the restore falls back to
``os.replace``, which may clobber such a third acquirer instead — same
detection, at the other party's release. A catalog CAS backend has
none of these windows.
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
        last_seen = object()  # sentinel: any first holder resets it
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
            # the deadline guards against ONE holder exceeding
            # timeout_s unbroken, not against fair-queue starvation: a
            # change of holder proves global progress, so reset it
            # (the unfair O_EXCL race has no queue; under contention a
            # waiter can lose many rounds while commits keep landing)
            holder_token = None if holder is None else holder.get("token")
            if holder_token != last_seen:
                last_seen = holder_token
                deadline = time.time() + self.timeout_s + 10.0
            # re-stat IMMEDIATELY before deciding to break: a lock
            # released and re-acquired since our last look must be seen
            # as fresh here, not broken on a stale observation
            try:
                age = time.time() - os.path.getmtime(self.lock_path)
            except OSError:
                continue  # released between open and stat — retry now
            if age > self.timeout_s:
                self._try_break(holder)
                continue
            if time.time() > deadline:
                raise TimeoutError(
                    f"commit lock {self.lock_path} not acquired: the "
                    f"same holder exceeded {self.timeout_s}s without "
                    f"the lock going stale (holder: {holder})"
                )
            time.sleep(0.02)

    def _try_break(self, holder: dict | None) -> None:
        """Break a lock judged stale (mtime past ``timeout_s``): rename
        it aside — NOT remove; two breakers racing on remove could each
        delete the OTHER's freshly created lock, while rename succeeds
        for exactly one — then verify the renamed file really is the
        stale lock before dropping it, restoring anything else."""
        stale = self.lock_path + f".stale.{uuid.uuid4().hex}"
        try:
            os.rename(self.lock_path, stale)
        except OSError:
            return  # someone else broke or released it
        got = self._read(stale)
        if got is not None:
            fresh = (
                time.time() - float(got.get("ts", 0)) <= self.timeout_s
                or (holder is not None
                    and got.get("token") != holder.get("token"))
            )
        else:
            # unreadable: an O_EXCL creator caught between its open
            # and write (young — restore it, its pending write lands
            # through the linked-back inode) vs a corrupt crashed lock
            # (old — safe to drop)
            try:
                fresh = (time.time() - os.path.getmtime(stale)
                         <= self.timeout_s)
            except OSError:
                fresh = True  # cannot prove stale: restore
        if fresh:
            # the renamed file is NOT the lock we judged stale (a
            # fresh holder slipped into the stat->rename window):
            # restore it
            self._restore(stale)
        else:
            with contextlib.suppress(OSError):
                os.remove(stale)

    def release(self, token: str) -> None:
        # pre-check IN PLACE: if the lock already carries another
        # token, we were broken and the path belongs to the new holder
        # — report without touching the file (the old rename-first
        # order created a vacancy here that a third acquirer could
        # enter while the displaced lock was being restored)
        in_place = self._read(self.lock_path)
        if in_place is not None and in_place.get("token") != token:
            raise CommitLockBroken(
                f"commit lock {self.lock_path} was broken while held "
                f"(our token {token}, found {in_place}): critical "
                f"section may have raced"
            )
        # rename-verify-remove: never permanently delete a lock whose
        # token we have not confirmed post-rename is ours (the
        # read→rename gap above is the only remaining displacement
        # window, and it requires a breaker firing inside it)
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
        # not ours: a breaker took our lock inside the read->rename gap
        # and a NEW holder owns the path now — put their lock back and
        # report the break
        self._restore(tmp)
        raise CommitLockBroken(
            f"commit lock {self.lock_path} was broken while held "
            f"(our token {token}, found {got}): critical section may "
            f"have raced"
        )

    def _restore(self, tmp: str) -> None:
        """Put a displaced lock file back at ``lock_path``. ``link``
        refuses to clobber a third acquirer that slipped into the
        vacancy (they own the path; the displaced holder detects the
        break at its own release via token mismatch). On filesystems
        without hard links the fallback is ``replace``, which may
        instead clobber such a third acquirer — same detection, at the
        other party's release."""
        try:
            os.link(tmp, self.lock_path)
        except FileExistsError:
            pass  # third acquirer won the vacancy; path is theirs
        except OSError:
            with contextlib.suppress(OSError):
                os.replace(tmp, self.lock_path)
            return
        with contextlib.suppress(OSError):
            os.remove(tmp)

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
        last_seen = object()
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
                holder_token = self._row["token"]
            if holder_token != last_seen:  # progress: new holder
                last_seen = holder_token
                deadline = time.time() + self.timeout_s + 10.0
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
