"""Commit-coordination seam (round-5): ownership-verified lockfile
release, the pluggable catalog-CAS backend, flat->sharded checkpoint
migration, and the legacy-manifest tomb_rows footer fallback.

The reference replicator needs none of this — its sink database
serializes writers internally (scylla-cdc-replicator Main.java:674-683).
A lake sink supplies that serialization itself, and these tests pin the
exact hazards a filesystem lock has that a DB does not: a stalled
holder whose lock was broken must never delete the NEW holder's lock,
and a non-POSIX deployment must be able to swap the lockfile for a
catalog CAS without touching the sink.
"""

import json
import os
import threading
import time

import pytest

from scylla_cdc_java_spark.model import (
    OP_PARTITION_DELETE,
    OP_ROW_INSERT,
    TableConfig,
)
from scylla_cdc_java_spark.operators.fold import fold_batch, normalize_log
from scylla_cdc_java_spark.sinks.commit_backend import (
    CommitLockBroken,
    InMemoryCASBackend,
    LockfileCommitBackend,
)
from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

SID = b"\x0c" * 16
COLS = ["repo", "path", "commit", "lang", "content"]


def _batch(spark, rows):
    data = [
        (SID, {"ms": r["ms"], "seq": r["seq"]}, r["op"],
         *[r.get(c) for c in COLS])
        for r in rows
    ]
    ddl = (
        "`cdc$stream_id` binary, `cdc$time` struct<ms:long,seq:long>, "
        "`cdc$operation` tinyint, "
        + ", ".join(f"`{c}` string" for c in COLS)
    )
    return normalize_log(spark.createDataFrame(data, schema=ddl))


def _ins(ms, seq, repo, path, content):
    return {"op": OP_ROW_INSERT, "ms": ms, "seq": seq, "repo": repo,
            "path": path, "content": content}


def _state(sink, **kw):
    return sorted(
        (r["repo"], r["path"], r["content"])
        for r in sink.read(**kw).collect()
    )


# ---------------------------------------------------------------------
# LockfileCommitBackend ownership semantics (no Spark needed)
# ---------------------------------------------------------------------
def test_lockfile_normal_acquire_release(tmp_path):
    be = LockfileCommitBackend(str(tmp_path / "L"), timeout_s=5.0)
    tok = be.acquire()
    assert os.path.exists(be.lock_path)
    on_disk = json.load(open(be.lock_path))
    assert on_disk["token"] == tok
    be.release(tok)
    assert not os.path.exists(be.lock_path)


def test_release_after_break_raises_and_preserves_new_holder(tmp_path):
    """A stalls past timeout; B breaks the lock and acquires. A's
    release must NOT delete B's lock (the round-5 ADVICE hazard: the
    old finally-block removed unconditionally, letting two processes
    run the critical section concurrently) — it must detect the break,
    restore/leave B's lock in place, and raise CommitLockBroken."""
    lock = str(tmp_path / "L")
    a = LockfileCommitBackend(lock, timeout_s=0.3)
    b = LockfileCommitBackend(lock, timeout_s=0.3)
    tok_a = a.acquire()
    time.sleep(0.4)                      # A "stalls" past timeout
    tok_b = b.acquire()                  # B judges A stale, breaks it
    assert json.load(open(lock))["token"] == tok_b
    with pytest.raises(CommitLockBroken):
        a.release(tok_a)
    # B's lock survived A's release attempt and is still B's
    assert os.path.exists(lock)
    assert json.load(open(lock))["token"] == tok_b
    b.release(tok_b)
    assert not os.path.exists(lock)


def test_break_restores_young_unreadable_lock(tmp_path):
    """A breaker whose rename lands on an O_EXCL creator's not-yet-
    written (empty) lock must RESTORE it, not drop it: the creator's
    pending write lands through the linked-back inode and its acquire
    stands. Previously an unreadable renamed file skipped the restore
    guard entirely, deleting the new holder's lock — two concurrent
    critical sections."""
    be = LockfileCommitBackend(str(tmp_path / "L"), timeout_s=0.3)
    # in-flight creator: exists, empty, YOUNG
    fd = os.open(be.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    be._try_break(holder=None)
    assert os.path.exists(be.lock_path), "young unreadable lock dropped"
    # the creator's write lands through the restored (linked) inode
    os.write(fd, json.dumps(
        {"pid": 1, "ts": time.time(), "token": "inflight"}).encode())
    os.close(fd)
    assert json.load(open(be.lock_path))["token"] == "inflight"
    # no stale-rename litter left behind
    assert [f for f in os.listdir(tmp_path) if ".stale." in f] == []


def test_break_drops_old_unreadable_lock(tmp_path):
    """An unreadable lock OLDER than the timeout is a corrupt crash
    remnant: the breaker drops it (restoring it forever would wedge
    every acquire) and acquire() then proceeds."""
    be = LockfileCommitBackend(str(tmp_path / "L"), timeout_s=0.3)
    open(be.lock_path, "w").close()  # empty = unreadable
    old = time.time() - 10
    os.utime(be.lock_path, (old, old))
    tok = be.acquire()  # breaks the corrupt lock and wins
    assert json.load(open(be.lock_path))["token"] == tok
    be.release(tok)


def test_release_precheck_never_displaces_foreign_lock(tmp_path):
    """When release finds another token IN PLACE it must report the
    break without touching the file: the old rename-first order made
    the path briefly vacant, letting a third acquirer in while the
    displaced lock was restored."""
    be = LockfileCommitBackend(str(tmp_path / "L"), timeout_s=5.0)
    tok = be.acquire()
    # a breaker broke us and a new holder owns the path now
    with open(be.lock_path, "w") as f:
        json.dump({"pid": 1, "ts": time.time(), "token": "theirs"}, f)
    ino = os.stat(be.lock_path).st_ino
    with pytest.raises(CommitLockBroken):
        be.release(tok)
    assert os.stat(be.lock_path).st_ino == ino, \
        "release renamed the foreign lock aside (vacancy window)"
    assert json.load(open(be.lock_path))["token"] == "theirs"


def test_release_when_lock_vanished_raises(tmp_path):
    be = LockfileCommitBackend(str(tmp_path / "L"), timeout_s=5.0)
    tok = be.acquire()
    os.remove(be.lock_path)
    with pytest.raises(CommitLockBroken):
        be.release(tok)


def test_lockfile_mutual_exclusion_threads(tmp_path):
    """128 acquire/critical/release cycles across 8 threads: the
    critical section may never be concurrently occupied."""
    be_per_thread = [
        LockfileCommitBackend(str(tmp_path / "L"), timeout_s=30.0)
        for _ in range(8)
    ]
    inside = [0]
    max_inside = [0]
    mu = threading.Lock()
    errs = []

    def run(be):
        try:
            for _ in range(16):
                tok = be.acquire()
                with mu:
                    inside[0] += 1
                    max_inside[0] = max(max_inside[0], inside[0])
                time.sleep(0.001)
                with mu:
                    inside[0] -= 1
                be.release(tok)
        except Exception as ex:
            errs.append(ex)

    ts = [threading.Thread(target=run, args=(be,)) for be in be_per_thread]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    assert max_inside[0] == 1


def test_inmemory_cas_break_and_release():
    be = InMemoryCASBackend(timeout_s=0.2)
    tok_a = be.acquire()
    time.sleep(0.25)
    tok_b = be.acquire()                 # TTL expiry -> lease stolen
    assert be.breaks == 1
    with pytest.raises(CommitLockBroken):
        be.release(tok_a)
    be.release(tok_b)


# ---------------------------------------------------------------------
# The seam: sink runs unmodified against a catalog-CAS backend
# ---------------------------------------------------------------------
def test_concurrent_merges_through_cas_backend(spark, tmp_root):
    """Two sink instances share one InMemoryCASBackend (emulating a
    DynamoDB/Iceberg-REST lease row) instead of the lockfile: LWW
    batches race through merge() from two threads; the final state and
    every commit's serializability must hold with zero lockfiles."""
    table = TableConfig()
    path = f"{tmp_root}/cas_tbl"
    backend = InMemoryCASBackend(timeout_s=60.0)
    sinks = [
        ParquetMergeSink(spark, path, table, num_buckets=4,
                         commit_backend=backend)
        for _ in range(2)
    ]
    errs = []

    def run(i):
        try:
            for k in range(3):
                sinks[i].merge(fold_batch(_batch(spark, [
                    _ins(100 * k + 10 + i, 0, f"o/r{i}", f"f{k}.py",
                         f"v{i}.{k}"),
                ]), table), {"writer": i, "step": k})
        except Exception as ex:
            errs.append(ex)

    ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    assert backend.acquires >= 6         # every commit went through CAS
    assert backend.breaks == 0
    assert not os.path.exists(os.path.join(path, "COMMIT.lock"))
    expect = sorted(
        (f"o/r{i}", f"f{k}.py", f"v{i}.{k}")
        for i in range(2) for k in range(3)
    )
    assert _state(sinks[0]) == expect
    # a fresh sink (default lockfile backend) reads the same table —
    # the backend choice never leaks into the data layout
    fresh = ParquetMergeSink.for_existing(spark, path)
    assert _state(fresh) == expect


# ---------------------------------------------------------------------
# Flat -> sharded checkpoint migration
# ---------------------------------------------------------------------
def test_flat_checkpoint_migration_to_sharded(spark, tmp_root):
    table = TableConfig()
    path = f"{tmp_root}/mig_tbl"
    sink = ParquetMergeSink(spark, path, table, num_buckets=2)
    flat_ck = {"last_ts": 99, "groups": {"0": {"last_ts": 99}},
               "done": False}
    sink.merge(fold_batch(_batch(spark, [
        _ins(10, 0, "o/r1", "a.py", "v1"),
    ]), table), flat_ck)

    # sharded write onto the flat table refuses loudly (round-5 ADVICE:
    # it used to silently drop the flat lineage and restart from epoch)
    with pytest.raises(ValueError, match="migrate"):
        sink.commit_checkpoint({"last_ts": 120, "done": False}, shard="s1")

    migrated = sink.migrate_checkpoint_to_shard("s0")
    assert migrated == flat_ck
    full = sink.checkpoint()
    assert full["shards"] == {"s0": flat_ck}
    assert full["done"] is False

    # double-migration and migration of an already-sharded table refuse
    with pytest.raises(ValueError, match="already sharded"):
        sink.migrate_checkpoint_to_shard("s9")

    # sharded writers now interoperate; s0's migrated lineage survives
    sink.commit_checkpoint({"last_ts": 120, "done": True}, shard="s1")
    assert sink.checkpoint(shard="s0") == flat_ck
    assert sink.checkpoint(shard="s1")["last_ts"] == 120
    assert sink.checkpoint()["done"] is False   # s0 not done

    # and the reverse guard still holds: flat write onto sharded raises
    with pytest.raises(ValueError, match="sharded"):
        sink.commit_checkpoint({"last_ts": 130})


def test_migrate_without_checkpoint_raises(spark, tmp_root):
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/mig_none", table,
                            num_buckets=1)
    sink.merge(fold_batch(_batch(spark, [
        _ins(10, 0, "o/r1", "a.py", "v1"),
    ]), table), None)
    with pytest.raises(ValueError, match="no checkpoint"):
        sink.migrate_checkpoint_to_shard("s0")


# ---------------------------------------------------------------------
# Legacy inline manifests: unknown tomb_rows -> footer-count fallback
# ---------------------------------------------------------------------
def test_legacy_manifest_tomb_rows_footer_fallback(spark, tmp_root):
    """Round-2/3 manifests never counted sidecar rows. Normalization
    must surface tomb_rows as UNKNOWN (None -> footer counts), not 0 —
    a 0 would route arbitrarily large legacy sidecars down the
    F.broadcast path that broadcast_tomb_limit exists to prevent
    (round-5 ADVICE). Correctness leg: reads over the legacy layout
    still apply the tombstones exactly."""
    table = TableConfig()
    path = f"{tmp_root}/legacy_tbl"
    sink = ParquetMergeSink(spark, path, table, num_buckets=2,
                            compact_threshold=1000)
    sink.merge(fold_batch(_batch(spark, [
        _ins(10, 0, "o/r1", "a.py", "v1"),
        _ins(10, 1, "o/r2", "b.py", "v1"),
    ]), table), None)
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_PARTITION_DELETE, "ms": 20, "seq": 0, "repo": "o/r1"},
    ]), table), None)

    # rewrite the root into the legacy inline shape (flat seg lists in
    # the root, no bucket_index, no tomb_rows anywhere)
    m = sink.manifest()
    legacy = {
        "version": m["version"],
        "buckets": m["buckets"],
        "tomb_segs": {b: s for b, s in m["tomb_segs"].items() if s},
        "value_columns": m["value_columns"],
        "collection_columns": m["collection_columns"],
        "checkpoint": m.get("checkpoint"),
        "table": m.get("table"),   # identity metadata (kept by rounds 2-3)
    }
    with open(os.path.join(path, "MANIFEST.json"), "w") as f:
        json.dump(legacy, f)

    fresh = ParquetMergeSink.for_existing(spark, path)
    res = fresh.manifest()
    tomb_buckets = [b for b, s in res["tomb_segs"].items() if s]
    assert tomb_buckets
    for b in tomb_buckets:
        assert res["_tomb_rows"][b] is None   # unknown, NOT 0
    # the read path takes the footer-count fallback and stays exact
    assert _state(fresh) == [("o/r2", "b.py", "v1")]
    # ... and with a tiny broadcast limit the same (footer-derived)
    # count must push the join down the non-broadcast path unchanged
    small = ParquetMergeSink(spark, path, table, num_buckets=2,
                             broadcast_tomb_limit=0)
    assert _state(small) == [("o/r2", "b.py", "v1")]
