"""Snapshot time travel on the merge sink: every commit writes an
immutable manifest under ``manifests/`` (the Iceberg snapshot model);
``read(version=...)`` reconstructs any retained snapshot, and
``vacuum(retain_snapshots=K)`` bounds the readable history while never
touching segments the retained snapshots still reference."""

import pytest

from scylla_cdc_java_spark.model import (
    OP_ROW_DELETE,
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
    TableConfig,
)
from scylla_cdc_java_spark.operators.fold import fold_batch, normalize_log
from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

SID = b"\x09" * 16
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


def _state(sink, version=None):
    return sorted(
        (r["repo"], r["path"], r["content"])
        for r in sink.read(version=version).collect()
    )


def test_time_travel_and_snapshot_gc(spark, tmp_root):
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/tt_target", table,
                            num_buckets=4,
                            reader_lease_s=0)  # immediate reaping: this
    # test asserts exact removal counts; lease safety has its own test

    b1 = _batch(spark, [
        {"op": OP_ROW_INSERT, "ms": 10, "seq": 0, "repo": "o/r",
         "path": "a.py", "content": "v1"},
        {"op": OP_ROW_INSERT, "ms": 11, "seq": 1, "repo": "o/r",
         "path": "b.py", "content": "w1"},
    ])
    sink.merge(fold_batch(b1, table), {"step": 1})
    v1 = sink.manifest()["version"]
    s1 = _state(sink)

    b2 = _batch(spark, [
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "o/r",
         "path": "a.py", "content": "v2"},
        {"op": OP_ROW_DELETE, "ms": 21, "seq": 1, "repo": "o/r",
         "path": "b.py"},
    ])
    sink.merge(fold_batch(b2, table), {"step": 2})
    v2 = sink.manifest()["version"]
    s2 = _state(sink)

    assert s1 == [("o/r", "a.py", "v1"), ("o/r", "b.py", "w1")]
    assert s2 == [("o/r", "a.py", "v2")]
    assert v1 in sink.snapshots() and v2 in sink.snapshots()

    # time travel reconstructs the PRE-update snapshot exactly
    assert _state(sink, version=v1) == s1
    assert _state(sink, version=v2) == s2

    # retention: keep only the newest snapshot; v1 becomes unreadable,
    # its superseded segments are reaped, the current state is intact
    removed = sink.vacuum(retain_snapshots=1)
    assert v1 not in sink.snapshots()
    with pytest.raises(FileNotFoundError):
        sink.manifest(version=v1)
    assert _state(sink) == s2

    # compaction + retention interplay: compact, old pre-compaction
    # snapshot v2 stays readable while retained...
    sink.compact()
    v3 = sink.manifest()["version"]
    assert _state(sink, version=v3) == s2
    assert _state(sink, version=v2) == s2  # still referenced + retained
    # ...then expires with retention 0 (current-only), and vacuum
    # removes the superseded delta segments
    removed2 = sink.vacuum(retain_snapshots=0)
    assert removed2 > 0
    assert sink.snapshots() == [v3]
    assert _state(sink) == s2


def test_vacuum_respects_reader_lease(spark, tmp_root):
    """Concurrent-reader safety (default posture): a lazy ``read()``
    plan resolved BEFORE a compact+vacuum must still execute and return
    its pinned snapshot — vacuum honors the reader lease and leaves the
    plan's files alone. Only after the lease is dropped does vacuum
    reap them."""
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/lease_target", table,
                            num_buckets=4)  # default reader_lease_s=60

    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_INSERT, "ms": 10, "seq": 0, "repo": "o/r",
         "path": "a.py", "content": "v1"},
    ]), table), {"step": 1})
    slow_reader = sink.read()  # lazy plan: resolves + pins v1's files

    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "o/r",
         "path": "a.py", "content": "v2"},
    ]), table), {"step": 2})
    sink.compact()
    removed_during_lease = sink.vacuum(retain_snapshots=0)

    # the slow reader executes AFTER compact+vacuum and still sees the
    # state it resolved (v1 files were leased, not deleted)
    got = [(r["repo"], r["path"], r["content"])
           for r in slow_reader.collect()]
    assert got == [("o/r", "a.py", "v1")]
    # current-state reads see the update, as always
    assert _state(sink) == [("o/r", "a.py", "v2")]

    # lease dropped -> the superseded files are reapable
    sink.reader_lease_s = 0
    assert sink.vacuum(retain_snapshots=0) > 0
    assert _state(sink) == [("o/r", "a.py", "v2")]
    assert removed_during_lease >= 0  # (vacuum itself never errored)


def test_rollback_then_replay_reconverges(spark, tmp_root):
    """Rollback = snapshot restore of table + checkpoint in one atomic
    commit; a fresh Engine.replay() after rollback re-consumes the log
    suffix idempotently and reconverges on the oracle state."""
    from scylla_cdc_java_spark import Engine, GenSpec, generate_world, write_world
    from scylla_cdc_java_spark.model import EngineConfig
    from scylla_cdc_java_spark.oracle import final_state, replay

    spec = GenSpec(seed=61, n_events=1200, n_repos=15, paths_per_repo=6,
                   n_generations=2, streams_per_generation=4,
                   gen_span_ms=120_000)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/rb_world")
    eng = Engine(spark, info["log_dir"], info["generations_path"],
                 f"{tmp_root}/rb_target",
                 cfg=EngineConfig(window_length_limit_ms=30_000))
    stats = eng.replay()
    assert stats.windows >= 4
    want = sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in final_state(replay(world["events"]))
    )

    def cur():
        return sorted(
            (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
            for r in eng.sink.read().collect()
        )

    assert cur() == want
    snaps = eng.sink.snapshots()
    mid = snaps[len(snaps) // 2]
    mid_state = sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in eng.sink.read(version=mid).collect()
    )
    assert mid_state != want  # rolling back to a genuinely earlier point

    eng.sink.rollback(mid)
    assert cur() == mid_state
    ck = eng.sink.checkpoint()
    assert ck is not None and not ck.get("done")

    # a fresh engine resumes from the restored checkpoint and
    # re-applies the suffix — exactly-once under LWW
    eng2 = Engine(spark, info["log_dir"], info["generations_path"],
                  f"{tmp_root}/rb_target",
                  cfg=EngineConfig(window_length_limit_ms=30_000))
    s2 = eng2.replay()
    assert s2.windows > 0
    assert sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in eng2.sink.read().collect()
    ) == want


def test_history_and_timestamp_time_travel(spark, tmp_root):
    """Every commit stamps wall-clock time + operation; history() lists
    them newest-first and version_as_of(ts) resolves timestamp time
    travel to the snapshot that was current at that instant."""
    import time as _time

    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/hist_target", table,
                            num_buckets=4)
    ins = {"op": OP_ROW_INSERT, "path": "p", "commit": "c", "lang": "l"}
    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": 0, "repo": "o/r1", "content": "v1"},
    ]), table), {"step": 1})
    t_between = int(_time.time() * 1000)
    _time.sleep(0.02)
    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 20, "seq": 0, "repo": "o/r1", "content": "v2"},
    ]), table), {"step": 2})
    sink.compact(buckets=[0, 1, 2, 3])

    h = sink.history()
    assert [x["version"] for x in h] == sorted(
        (x["version"] for x in h), reverse=True)
    ops = {x["version"]: x["operation"] for x in h}
    assert "merge" in ops.values() and "compact" in ops.values()
    stamps = [x["committed_at_ms"] for x in h]
    assert all(isinstance(t, int) for t in stamps)
    assert stamps == sorted(stamps, reverse=True)

    v = sink.version_as_of(t_between)
    rows = sink.read(version=v).collect()
    assert [r["content"] for r in rows] == ["v1"]
    # "now" resolves to the current snapshot's content
    v_now = sink.version_as_of(int(_time.time() * 1000))
    assert [r["content"]
            for r in sink.read(version=v_now).collect()] == ["v2"]
    with pytest.raises(ValueError, match="no retained snapshot"):
        sink.version_as_of(t_between - 10_000_000)

    # rollback stamps its own moment, not the restored snapshot's
    first_v = min(x["version"] for x in h)
    sink.rollback(first_v)
    h2 = sink.history()
    assert h2[0]["operation"] == "rollback"
    assert h2[0]["committed_at_ms"] >= stamps[0]
