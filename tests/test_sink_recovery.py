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


def test_vacuum_removes_orphans_keeps_state(spark, tmp_root):
    """Superseded bucket versions accumulate across windows; vacuum()
    must delete them without changing the visible table."""
    import os

    world = generate_world(SPEC)
    info = write_world(world, f"{tmp_root}/vac_world")
    eng = Engine(spark, info["log_dir"], info["generations_path"],
                 f"{tmp_root}/vac_target",
                 cfg=EngineConfig(window_length_limit_ms=30_000))
    stats = eng.replay()
    assert stats.windows > 3
    before = _rows(eng.sink)

    def bucket_dirs(root):
        out = []
        for v in os.listdir(os.path.join(root, "data")):
            out += os.listdir(os.path.join(root, "data", v))
        return out

    n_before = len(bucket_dirs(eng.sink.path))
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
