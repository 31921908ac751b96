"""Sink recovery semantics: crash mid-replay -> resume, orphan vacuum,
and the foreachBatch redelivery guard (exactly-once plumbing around the
atomic manifest commit)."""

import pytest

from scylla_cdc_java_spark import Engine, GenSpec, StructuredTail, generate_world, write_world
from scylla_cdc_java_spark.model import EngineConfig
from scylla_cdc_java_spark.oracle import final_state, replay


def _rows(sink):
    return sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in sink.read().collect()
    )


def _oracle(world):
    return sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in final_state(replay(world["events"]))
    )


SPEC = GenSpec(seed=55, n_events=1500, n_repos=25, paths_per_repo=8,
               n_generations=2, streams_per_generation=4,
               gen_span_ms=120_000)


def test_crash_mid_replay_resumes_exactly_once(spark, tmp_root):
    """Kill the replay after 2 committed windows (merge raises before
    the 3rd commit): the manifest must still describe a consistent
    prefix, and a fresh Engine on the same target must finish to the
    oracle state."""
    world = generate_world(SPEC)
    info = write_world(world, f"{tmp_root}/crash_world")
    cfg = EngineConfig(window_length_limit_ms=30_000)
    target = f"{tmp_root}/crash_target"

    eng = Engine(spark, info["log_dir"], info["generations_path"], target,
                 cfg=cfg)
    real_merge = eng.sink.merge
    calls = {"n": 0}

    def dying_merge(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("simulated crash before commit")
        return real_merge(*a, **kw)

    eng.sink.merge = dying_merge
    with pytest.raises(RuntimeError):
        eng.replay()
    assert calls["n"] == 3

    ckpt = eng.sink.checkpoint()
    assert ckpt is not None and not ckpt.get("done")

    eng2 = Engine(spark, info["log_dir"], info["generations_path"], target,
                  cfg=cfg)
    stats = eng2.replay()
    assert stats.windows > 0
    assert eng2.sink.checkpoint().get("done")
    assert _rows(eng2.sink) == _oracle(world)


def test_compact_then_vacuum_keeps_state(spark, tmp_root):
    """Delta segments accumulate across windows (merge-on-read);
    compact() must collapse every bucket to one base segment and
    vacuum() must delete the superseded deltas — without changing the
    visible table."""
    import os

    world = generate_world(SPEC)
    info = write_world(world, f"{tmp_root}/vac_world")
    eng = Engine(spark, info["log_dir"], info["generations_path"],
                 f"{tmp_root}/vac_target",
                 cfg=EngineConfig(window_length_limit_ms=30_000,
                                  compact_threshold=1000))  # no auto-compact
    stats = eng.replay()
    assert stats.windows > 3
    before = _rows(eng.sink)
    m = eng.sink.manifest()
    assert any(len(s) > 1 for s in m["buckets"].values())  # real deltas

    def bucket_dirs(root):
        out = []
        for v in os.listdir(os.path.join(root, "data")):
            for sub in os.listdir(os.path.join(root, "data", v)):
                sdir = os.path.join(root, "data", v, sub)
                if os.path.isdir(sdir):
                    out += os.listdir(sdir)
        return out

    cstats = eng.sink.compact()
    assert cstats["compacted"]
    m2 = eng.sink.manifest()
    assert all(len(s) == 1 for s in m2["buckets"].values())
    # sidecar tombstones were folded into the rows and CLEARED (lake
    # tombstone GC at compaction — their shadowing now lives in each
    # covered row's _ts_tomb)
    assert any(segs for segs in m["tomb_segs"].values())
    assert not any(segs for segs in m2["tomb_segs"].values())

    n_before = len(bucket_dirs(eng.sink.path))
    eng.sink.reader_lease_s = 0  # test wants immediate reaping (the
    # default 60 s lease protects concurrent readers; see
    # test_time_travel.py::test_vacuum_respects_reader_lease)
    removed = eng.sink.vacuum()
    assert removed > 0
    assert len(bucket_dirs(eng.sink.path)) == n_before - removed
    assert _rows(eng.sink) == before == _oracle(world)


def test_stream_batch_redelivery_is_noop(spark, tmp_root):
    """At-least-once foreachBatch: a batch id already committed in the
    sink manifest must not be re-folded (would consume pending-range
    pairing state twice)."""
    spec = GenSpec(seed=56, n_events=600, n_repos=10, paths_per_repo=6,
                   n_generations=1, streams_per_generation=4,
                   p_range_delete=0.10)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/redeliver_world")
    tail = StructuredTail(spark, info["log_dir"],
                          f"{tmp_root}/redeliver_target")
    batch_df = tail.spark.read.parquet(info["log_dir"])

    tail._apply_batch(batch_df, batch_id=0)
    v1 = tail.sink.manifest()["version"]
    state1 = _rows(tail.sink)
    ckpt1 = tail.sink.checkpoint()

    # redelivery of the SAME batch id: strict no-op (no new version)
    tail._apply_batch(batch_df, batch_id=0)
    assert tail.sink.manifest()["version"] == v1
    assert tail.sink.checkpoint() == ckpt1
    assert _rows(tail.sink) == state1 == _oracle(world)


def test_auto_compaction_bounds_segments(spark, tmp_root):
    """merge() piggybacks compact() once a bucket reaches
    compact_threshold segments: segment counts stay bounded across an
    arbitrarily long replay and the final state still matches the
    oracle (write cost per window is O(window) + O(bucket)/threshold,
    never O(table) — the round-3 merge-on-read contract)."""
    world = generate_world(SPEC)
    info = write_world(world, f"{tmp_root}/ac_world")
    eng = Engine(spark, info["log_dir"], info["generations_path"],
                 f"{tmp_root}/ac_target",
                 cfg=EngineConfig(window_length_limit_ms=30_000,
                                  compact_threshold=3))
    stats = eng.replay()
    assert stats.windows >= 4  # enough windows to trip the threshold
    m = eng.sink.manifest()
    assert all(len(s) <= 3 for s in m["buckets"].values())
    assert any(len(s) == 1 for s in m["buckets"].values())  # compacted
    assert _rows(eng.sink) == _oracle(world)


def test_tail_backoff_tiers_are_real(spark, tmp_root, monkeypatch):
    """T5 poll backoff: tail() must sleep the reference's 1/10/30 s
    tiers (Worker.java:28-30) scaled ONLY by EngineConfig.sleep_scale —
    round 2 hard-capped every sleep at 50 ms in production code."""
    import types

    import scylla_cdc_java_spark.streaming.engine as eng_mod
    from scylla_cdc_java_spark.model import EngineConfig as EC

    spec = GenSpec(seed=77, n_events=400, n_repos=10, paths_per_repo=5,
                   n_generations=1, streams_per_generation=4,
                   gen_span_ms=120_000)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/tail_bo_world")
    clk = {"t": spec.gen0_start_ms + 40_000}

    def clock():
        clk["t"] += 20_000
        return clk["t"]

    cfg = EC(window_length_limit_ms=30_000, sleep_scale=1e-3)
    eng = Engine(spark, info["log_dir"], info["generations_path"],
                 f"{tmp_root}/tail_bo_target", cfg=cfg, clock=clock)
    slept: list[float] = []
    import time as _time
    shim = types.SimpleNamespace(time=_time.time, sleep=slept.append)
    monkeypatch.setattr(eng_mod, "time", shim)
    stats = eng.tail(max_windows=8)
    assert stats.rows > 0 and stats.windows > 0
    tiers = {
        round(cfg.poll_cropped_s * cfg.sleep_scale, 9),
        round(cfg.poll_busy_s * cfg.sleep_scale, 9),
        round(cfg.poll_idle_s * cfg.sleep_scale, 9),
    }
    assert slept and {round(s, 9) for s in slept} <= tiers
    # a consuming (non-cropped) window must sleep the BUSY tier, not a cap
    assert round(cfg.poll_busy_s * cfg.sleep_scale, 9) in {
        round(s, 9) for s in slept
    }


def test_vacuum_grace_protects_freshly_staged_empty_dirs(spark, tmp_root):
    """The mkdir->first-file window of a concurrent writer's staging:
    vacuum must NOT rmdir a fresh EMPTY role/version dir under
    staging_grace_s (an ungraced sweep once deleted a live merge's
    staging tree out from under Hadoop's output committer — caught by
    the six-process capstone), but a stale one (crashed writer) is
    reaped."""
    import os
    import time as _time

    from scylla_cdc_java_spark.model import TableConfig
    from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

    target = f"{tmp_root}/vac_grace"
    sink = ParquetMergeSink(spark, target, TableConfig(), num_buckets=4)
    # emulate a concurrent writer that JUST created its staging tree
    fresh = os.path.join(target, "data", "v99-deadbeef", "rows")
    os.makedirs(fresh)
    stale = os.path.join(target, "data", "v98-cafecafe", "rows")
    os.makedirs(stale)
    old = _time.time() - 3600
    os.utime(stale, (old, old))
    os.utime(os.path.dirname(stale), (old, old))

    sink.vacuum(staging_grace_s=600)
    assert os.path.isdir(fresh), "graced fresh staging must survive"
    assert not os.path.exists(os.path.dirname(stale)), \
        "stale crashed staging must be reaped"

    # and with grace disabled (single-process semantics) both go
    sink.vacuum(staging_grace_s=0)
    assert not os.path.exists(os.path.dirname(fresh))


def test_vacuum_reaps_stale_staging_tree_in_one_pass(spark, tmp_root):
    """Review finding: reaping a stale staging CHILD refreshes the role
    dir's mtime; the empty-dir grace must key on the PRE-sweep age so
    a crashed writer's whole tree goes in ONE vacuum pass."""
    import os
    import time as _time

    from scylla_cdc_java_spark.model import TableConfig
    from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

    target = f"{tmp_root}/vac_one_pass"
    sink = ParquetMergeSink(spark, target, TableConfig(), num_buckets=4)
    tree = os.path.join(target, "data", "v97-feedface", "rows")
    child = os.path.join(tree, "__bucket=3")
    os.makedirs(child)
    with open(os.path.join(child, "part-0.parquet"), "w") as f:
        f.write("x")
    old = _time.time() - 3600
    for p in (child, tree, os.path.dirname(tree)):
        os.utime(p, (old, old))

    sink.vacuum(staging_grace_s=600)
    assert not os.path.exists(os.path.dirname(tree)), \
        "stale tree (with children) must be reaped in one pass"
