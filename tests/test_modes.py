"""Pre/post-image consumption modes (replicator Main.java:577-598 and
653-672) — golden tests via oracle-derived image rows."""

from scylla_cdc_java_spark import Engine, GenSpec, generate_world, write_world
from scylla_cdc_java_spark.images import filter_ops, with_images
from scylla_cdc_java_spark.model import (
    EngineConfig,
    OP_PARTITION_DELETE,
    OP_POSTIMAGE,
    OP_RANGE_DELETE_END_EXCLUSIVE,
    OP_RANGE_DELETE_END_INCLUSIVE,
    OP_RANGE_DELETE_START_EXCLUSIVE,
    OP_RANGE_DELETE_START_INCLUSIVE,
    OP_ROW_DELETE,
)
from scylla_cdc_java_spark.oracle import OracleState, apply_event, final_state

SPEC = GenSpec(seed=21, n_events=800, n_repos=25, paths_per_repo=8,
               n_generations=1, streams_per_generation=4)


def _oracle_rows(events):
    st = OracleState()
    n = len(events["ms"])
    for i in range(n):
        apply_event(st, {
            "op": events["op"][i], "ms": events["ms"][i], "seq": events["seq"][i],
            "stream_id": events["stream_id"][i], "repo": events["repo"][i],
            "path": events["path"][i], "commit": events["commit"][i],
            "lang": events["lang"][i], "content": events["content"][i],
            "del_commit": events["del_commit"][i], "del_lang": events["del_lang"][i],
            "del_content": events["del_content"][i],
        })
    return final_state(st)


def _engine_rows(sink):
    rows = sink.read().collect()
    return [
        {"repo": r["repo"], "path": r["path"], "commit": r["commit"],
         "lang": r["lang"], "content": r["content"]}
        for r in sorted(rows, key=lambda r: (r["repo"], r["path"]))
    ]


def test_postimage_mode_matches_oracle(spark, tmp_root):
    world = with_images(generate_world(SPEC), preimage_fraction=0.0, postimage=True)
    info = write_world(world, f"{tmp_root}/world_post")
    eng = Engine(spark, info["log_dir"], info["generations_path"],
                 f"{tmp_root}/target_post",
                 cfg=EngineConfig(mode="postimage"))
    eng.replay()
    # oracle consumes exactly what postimage mode consumes: images + deletes
    keep = {OP_POSTIMAGE, OP_ROW_DELETE, OP_PARTITION_DELETE,
            OP_RANGE_DELETE_START_INCLUSIVE, OP_RANGE_DELETE_START_EXCLUSIVE,
            OP_RANGE_DELETE_END_INCLUSIVE, OP_RANGE_DELETE_END_EXCLUSIVE}
    oracle = [
        {k: r[k] for k in ("repo", "path", "commit", "lang", "content")}
        for r in _oracle_rows(filter_ops(world["events"], keep))
    ]
    assert _engine_rows(eng.sink) == oracle


def test_preimage_mode_zero_mismatches(spark, tmp_root):
    world = with_images(generate_world(SPEC), preimage_fraction=0.6, postimage=False)
    info = write_world(world, f"{tmp_root}/world_pre")
    eng = Engine(spark, info["log_dir"], info["generations_path"],
                 f"{tmp_root}/target_pre", cfg=EngineConfig(mode="preimage"))
    stats = eng.replay()
    assert stats.preimage_mismatches == 0
    # and delta application still matches the oracle on the full op set
    oracle = [
        {k: r[k] for k in ("repo", "path", "commit", "lang", "content")}
        for r in _oracle_rows(world["events"])
    ]
    assert _engine_rows(eng.sink) == oracle


def test_preimage_detects_corruption(spark, tmp_root):
    world = with_images(generate_world(SPEC), preimage_fraction=0.6, postimage=False)
    ev = world["events"]
    # corrupt some preimage assertions (claim content was "WRONG")
    corrupted = 0
    for i in range(len(ev["op"])):
        if ev["op"][i] == 0 and corrupted < 5:
            ev["content"][i] = "WRONG-" + str(i)
            corrupted += 1
    assert corrupted
    info = write_world(world, f"{tmp_root}/world_pre_bad")
    eng = Engine(spark, info["log_dir"], info["generations_path"],
                 f"{tmp_root}/target_pre_bad", cfg=EngineConfig(mode="preimage"))
    stats = eng.replay()
    assert stats.preimage_mismatches >= corrupted


def test_preimage_check_across_batches(spark, tmp_root):
    """Preimage rows in window N referring to state written in window
    N-1 must verify against the SINK's state (multi-batch seeding)."""
    # 2 generations: gen-2 windows are crop-limited (epoch-0 exemption
    # only covers gen 1), forcing multi-batch chaining
    spec = GenSpec(seed=31, n_events=600, n_repos=15, paths_per_repo=6,
                   n_generations=2, streams_per_generation=4,
                   gen_span_ms=90_000)
    world = with_images(generate_world(spec), preimage_fraction=0.5, postimage=False)
    info = write_world(world, f"{tmp_root}/world_pre_mb")
    eng = Engine(spark, info["log_dir"], info["generations_path"],
                 f"{tmp_root}/target_pre_mb",
                 cfg=EngineConfig(mode="preimage", window_length_limit_ms=30_000))
    stats = eng.replay()
    assert stats.windows > 2
    assert stats.preimage_mismatches == 0


def test_structured_tail_preimage_parity(spark, tmp_root):
    """The Structured Streaming surface runs the SAME preimage
    verification replay()/tail() do (shared verify_preimages): a
    corrupted op-0 assertion is counted, a clean world counts zero —
    the mode's guarantee holds on every consumption surface."""
    from scylla_cdc_java_spark import StructuredTail

    # clean control
    world = with_images(generate_world(SPEC), preimage_fraction=0.6,
                        postimage=False)
    info = write_world(world, f"{tmp_root}/world_st_pre")
    tail = StructuredTail(
        spark, info["log_dir"], f"{tmp_root}/target_st_pre",
        cfg=EngineConfig(mode="preimage"), max_files_per_trigger=4,
    )
    assert tail.run_available_now() >= 1
    assert tail.preimage_mismatches == 0
    oracle = [
        {k: r[k] for k in ("repo", "path", "commit", "lang", "content")}
        for r in _oracle_rows(world["events"])
    ]
    assert _engine_rows(tail.sink) == oracle

    # corrupted assertions are detected and counted
    bad = with_images(generate_world(SPEC), preimage_fraction=0.6,
                      postimage=False)
    ev = bad["events"]
    corrupted = 0
    for i in range(len(ev["op"])):
        if ev["op"][i] == 0 and corrupted < 5:
            ev["content"][i] = "WRONG-" + str(i)
            corrupted += 1
    assert corrupted == 5
    info_bad = write_world(bad, f"{tmp_root}/world_st_pre_bad")
    tail_bad = StructuredTail(
        spark, info_bad["log_dir"], f"{tmp_root}/target_st_pre_bad",
        cfg=EngineConfig(mode="preimage"),
    )
    tail_bad.run_available_now()
    assert tail_bad.preimage_mismatches >= corrupted
