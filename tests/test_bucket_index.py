"""Sharded bucket index (sinks/bucket_index.py): the round-5 answer to
the contention probe's finding that the inline O(num_buckets) root
capped ANY table at ~6 commits/s at 16k buckets. These tests pin the
index semantics directly (no Spark): delta layering, deletions, fold
amortization, legacy migration, vacuum retention, and that the raw
root stays O(n_shards + n_deltas) as buckets grow.
"""

import json
import os

import pytest

from scylla_cdc_java_spark.sinks.bucket_index import (
    ShardedBucketIndex,
    copy_index,
    n_shards_for,
)
from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink


def _entry(b, v=1):
    return {"path": f"meta/b{b}/v{v}.json", "n_segs": 1,
            "n_tomb_segs": 0, "tomb_rows": 0}


def _mk(tmp_path, entries=None, num_buckets=4096):
    cache = {}
    idx = ShardedBucketIndex.create(
        str(tmp_path), entries or {}, num_buckets, version=1, cache=cache)
    return idx, cache


def test_point_lookup_layering(tmp_path):
    idx, _ = _mk(tmp_path, {str(b): _entry(b) for b in range(100)})
    # base hit
    assert idx["7"]["path"] == "meta/b7/v1.json"
    # overlay wins over base
    idx["7"] = _entry(7, v=9)
    assert idx["7"]["path"] == "meta/b7/v9.json"
    # flush -> delta layer wins over base
    idx.flush(version=2)
    assert not idx._overlay
    assert idx["7"]["path"] == "meta/b7/v9.json"
    # a later overlay wins over the delta
    idx["7"] = _entry(7, v=11)
    assert idx["7"]["path"] == "meta/b7/v11.json"
    with pytest.raises(KeyError):
        idx["100"]
    assert idx.get("100") is None


def test_deletion_tombstones_through_flush(tmp_path):
    idx, cache = _mk(tmp_path, {str(b): _entry(b) for b in range(10)})
    idx.pop("3", None)
    assert "3" not in idx
    desc = idx.flush(version=2)
    # reload from descriptor: deletion persisted as a JSON null
    fresh = ShardedBucketIndex(str(tmp_path), desc, cache={})
    assert "3" not in fresh
    assert len(fresh) == 9
    assert sorted(fresh.keys()) == sorted(
        str(b) for b in range(10) if b != 3)


def test_set_then_delete_same_commit_leaves_no_tombstone(tmp_path):
    """A bucket added and deleted within ONE commit's overlay was
    persisted as a spurious null that every later delta-merge and fold
    carried forever; it must simply drop out of the overlay. A delete
    of a bucket that exists BELOW the overlay still persists the
    null."""
    idx, _ = _mk(tmp_path, {str(b): _entry(b) for b in range(4)})
    idx["77"] = _entry(77)
    del idx["77"]
    assert "77" not in idx
    assert "77" not in idx._overlay, "overlay kept a junk tombstone"
    # flush with only the junk candidate: no delta file is written
    n_before = len(idx._deltas)
    idx.flush(version=2)
    assert len(idx._deltas) == n_before
    # a real deletion (bucket lives in base) still writes a null
    del idx["2"]
    desc = idx.flush(version=3)
    delta = json.load(
        open(os.path.join(str(tmp_path), desc["deltas"][-1])))
    assert delta == {"2": None}
    fresh = ShardedBucketIndex(str(tmp_path), desc, cache={})
    assert "2" not in fresh and "77" not in fresh
    assert sorted(fresh.keys()) == ["0", "1", "3"]


def test_vacuum_reaps_orphaned_tmp_files(tmp_path):
    """A writer crashed between open(tmp) and os.replace leaves a
    '<name>.json.tmp.<hex>' file that no root ever references; the
    vacuum meta sweep (which matched only '.json' finals) must reap
    those too, or crashes leak disk forever — while respecting the
    same staging grace that protects a LIVE writer's in-flight tmp."""
    path = str(tmp_path / "tbl")
    sink = ParquetMergeSink(None, path, num_buckets=8, reader_lease_s=0)
    root = sink._load_root()
    root.update(version=1, bucket_index={
        "0": {"segs": [], "tomb_segs": [], "tomb_rows": 0}})
    sink._commit(root)
    bdir = os.path.join(path, "meta", "b0")
    idxdir = os.path.join(path, "meta", "index")
    os.makedirs(bdir, exist_ok=True)
    orphans = [os.path.join(bdir, "v9.json.tmp.deadbeef"),
               os.path.join(idxdir, "delta-v9.x.json.tmp.deadbeef")]
    for p in orphans:
        open(p, "w").close()
    # under a grace window, young tmp files (an in-flight writer's)
    # survive
    sink.vacuum(retain_snapshots=0, staging_grace_s=600)
    assert all(os.path.exists(p) for p in orphans)
    sink.vacuum(retain_snapshots=0)  # grace 0: crash remnants reaped
    assert not any(os.path.exists(p) for p in orphans)


def test_commit_is_o_touched_not_o_buckets(tmp_path):
    """The serialized root and the per-commit delta must not grow with
    num_buckets — the exact property the contention probe found
    missing."""
    n = 16384
    idx, _ = _mk(tmp_path, {str(b): _entry(b) for b in range(n)},
                 num_buckets=n)
    idx["5"] = _entry(5, v=2)
    idx["77"] = _entry(77, v=2)
    desc = idx.flush(version=2)
    root_bytes = len(json.dumps(desc))
    assert root_bytes < 5000  # descriptor only; inline was ~1.4 MB
    delta_rel = desc["deltas"][-1]
    delta = json.load(open(os.path.join(tmp_path, delta_rel)))
    assert sorted(delta) == ["5", "77"]  # O(touched)
    assert desc["n_shards"] == n_shards_for(n)


def test_fold_amortizes_and_preserves_state(tmp_path):
    idx, _ = _mk(tmp_path, {str(b): _entry(b) for b in range(50)},
                 num_buckets=50)
    # 5 commits with fold threshold 3: a fold must fire and clear deltas
    folded = False
    for v in range(2, 7):
        idx[str(v)] = _entry(v, v=v)
        desc = idx.flush(version=v, fold_deltas=3)
        if not desc["deltas"]:
            folded = True
    assert folded
    fresh = ShardedBucketIndex(str(tmp_path), idx.descriptor(), cache={})
    assert len(fresh) == 50
    for v in range(2, 7):
        assert fresh[str(v)]["path"] == f"meta/b{v}/v{v}.json"


def test_copy_isolates_overlay(tmp_path):
    idx, _ = _mk(tmp_path, {"0": _entry(0)})
    c = copy_index(idx)
    c["1"] = _entry(1)
    assert "1" in c and "1" not in idx
    # plain dicts work through the same helper (legacy roots)
    d = copy_index({"0": _entry(0)})
    assert isinstance(d, dict)


def test_flush_does_not_leak_into_parent_delta_view(tmp_path):
    """``copy()`` shares the lazily-merged delta view with its parent;
    ``flush()`` on the copy must not mutate it in place — the parent's
    delta LIST doesn't reference the new delta file, so in-place update
    would make the parent index report entries its own descriptor
    cannot resolve (an aborted-commit retry would then skip rewriting
    them)."""
    idx, _ = _mk(tmp_path, {"0": _entry(0)})
    idx["1"] = _entry(1)
    idx.flush(version=2)  # parent now has one delta file
    _ = idx["1"]          # materialize the parent's merged delta view
    c = copy_index(idx)
    c["2"] = _entry(2)
    c.flush(version=3)
    assert "2" in c
    assert "2" not in idx, "flush leaked into the parent's delta view"
    # parent still resolves its own entries
    assert idx["1"]["path"] == _entry(1)["path"]


def test_sink_migrates_legacy_inline_root(tmp_path):
    """A round-4 root with an inline bucket_index migrates to the
    sharded layout on its next commit, preserving every entry."""
    path = str(tmp_path / "tbl")
    os.makedirs(path)
    inline = {str(b): {"segs": [f"data/v1/rows/__bucket={b}"],
                       "tomb_segs": [], "tomb_rows": 0}
              for b in range(40)}
    with open(os.path.join(path, "MANIFEST.json"), "w") as f:
        json.dump({"version": 3, "bucket_index": inline,
                   "value_columns": [], "collection_columns": [],
                   "checkpoint": None, "num_buckets": 40}, f)
    sink = ParquetMergeSink(None, path, num_buckets=40)
    root = sink._load_root()
    assert isinstance(root["bucket_index"], dict)  # legacy stays plain
    # any commit migrates
    root["version"] += 1
    sink._commit(root)
    raw = json.load(open(os.path.join(path, "MANIFEST.json")))
    assert raw["bucket_index"].get("__sharded__") is True
    reread = sink._load_root()["bucket_index"]
    assert isinstance(reread, ShardedBucketIndex)
    assert len(reread) == 40
    assert reread["17"]["segs"] == ["data/v1/rows/__bucket=17"]


def test_vacuum_keeps_referenced_index_files(tmp_path):
    """vacuum must treat base-shard and delta files like bucket
    manifests: keep what current + retained snapshots reference, reap
    the rest."""
    path = str(tmp_path / "tbl")
    sink = ParquetMergeSink(None, path, num_buckets=64,
                            snapshot_retention=None, reader_lease_s=0,
                            index_fold_deltas=3)  # force a fold: the
    # folded-away delta files and superseded base shards become stale
    root = sink._load_root()
    root.update(version=1,
                bucket_index={str(b): {"segs": [], "tomb_segs": [],
                                       "tomb_rows": 0}
                              for b in range(64)})
    sink._commit(root)
    # several delta commits
    for v in range(2, 6):
        cur = sink._load_root()
        nxt = dict(cur)
        nxt["version"] = v
        nxt["bucket_index"] = copy_index(cur["bucket_index"])
        nxt["bucket_index"][str(v)] = {
            "segs": [], "tomb_segs": [], "tomb_rows": 0}
        sink._commit(nxt)
    index_dir = os.path.join(path, "meta", "index")
    before = set(os.listdir(index_dir))
    sink.vacuum(retain_snapshots=0)
    after = set(os.listdir(index_dir))
    cur = sink._load_root()["bucket_index"]
    needed = {os.path.basename(p) for p in cur.referenced_files()}
    # with no retained snapshots and no leases, exactly the current
    # root's referenced index files survive — stale ones are reaped
    assert after == needed
    assert needed < before
    # and the table still reads back complete
    assert len(cur) == 64


def test_vacuum_reaps_orphan_index_files(tmp_path):
    path = str(tmp_path / "tbl")
    sink = ParquetMergeSink(None, path, num_buckets=8, reader_lease_s=0)
    root = sink._load_root()
    root.update(version=1, bucket_index={"0": {"segs": [], "tomb_segs": [],
                                               "tomb_rows": 0}})
    sink._commit(root)
    orphan = os.path.join(path, "meta", "index", "delta-v99.dead.json")
    with open(orphan, "w") as f:
        json.dump({"0": None}, f)
    sink.vacuum(retain_snapshots=0)
    assert not os.path.exists(orphan)
    assert len(sink._load_root()["bucket_index"]) == 1
