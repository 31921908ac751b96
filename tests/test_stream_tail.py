"""Structured Streaming tail: availableNow backlog drain must produce
the same final state as the batch engine / pure-Python oracle."""

import hashlib

from scylla_cdc_java_spark import GenSpec, StructuredTail, generate_world, write_world
from scylla_cdc_java_spark.model import EngineConfig
from scylla_cdc_java_spark.oracle import final_state, replay


def _state(sink):
    rows = sink.read().collect()
    return [
        {
            "repo": r["repo"], "path": r["path"], "commit": r["commit"],
            "lang": r["lang"], "content": r["content"],
            "content_sha256": hashlib.sha256(r["content"].encode()).hexdigest()
            if r["content"] is not None else None,
        }
        for r in sorted(rows, key=lambda r: (r["repo"], r["path"]))
    ]


def test_stream_tail_matches_oracle(spark, tmp_root):
    spec = GenSpec(seed=42, n_events=2000, n_repos=40, paths_per_repo=12,
                   n_generations=2, streams_per_generation=8,
                   gen_span_ms=60_000)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/world_stream")
    tail = StructuredTail(spark, info["log_dir"], f"{tmp_root}/target_stream")
    n_batches = tail.run_available_now()
    assert n_batches >= 1
    oracle_rows = final_state(replay(world["events"]))
    assert _state(tail.sink) == oracle_rows


def test_stream_tail_incremental_batches(spark, tmp_root):
    """maxFilesPerTrigger forces several microbatches; pending range
    state must carry across them through the sink manifest."""
    spec = GenSpec(seed=7, n_events=1500, n_repos=25, paths_per_repo=8,
                   n_generations=1, streams_per_generation=4)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/world_stream2")
    tail = StructuredTail(
        spark, info["log_dir"], f"{tmp_root}/target_stream2",
        max_files_per_trigger=2,
    )
    n_batches = tail.run_available_now()
    assert n_batches > 1, "expected multiple microbatches"
    oracle_rows = final_state(replay(world["events"]))
    assert _state(tail.sink) == oracle_rows


def test_stream_tail_resume_after_restart(spark, tmp_root):
    """New files after a drained run are picked up by a second
    availableNow pass from the stream checkpoint (T3 chaining)."""
    spec = GenSpec(seed=9, n_events=800, n_repos=15, paths_per_repo=6,
                   n_generations=1, streams_per_generation=4)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/world_stream3")
    target = f"{tmp_root}/target_stream3"
    tail = StructuredTail(spark, info["log_dir"], target)
    tail.run_available_now()
    state1 = _state(tail.sink)
    # second pass with nothing new: state unchanged (idempotent)
    tail2 = StructuredTail(spark, info["log_dir"], target,
                           stream_checkpoint_dir=tail.stream_checkpoint_dir)
    tail2.run_available_now()
    assert _state(tail2.sink) == state1
