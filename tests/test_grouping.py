"""splitStreams semantics (reference Master.java:59-105) — the suite the
reference itself lacks (SURVEY.md section 5 'notably untested')."""

import numpy as np

from scylla_cdc_java_spark.plans.grouping import (
    StreamGrouper,
    ring_tokens,
    split_streams,
    token_of,
)


def _streams(n, seed=7):
    rng = np.random.default_rng(seed)
    return [rng.bytes(16) for _ in range(n)]


def test_all_streams_assigned_exactly_once():
    ids = _streams(100)
    groups = split_streams(ids, ring_tokens(8))
    flat = [s for g in groups for s in g]
    assert sorted(flat) == sorted(ids)
    assert len(flat) == len(set(flat))


def test_groups_are_token_contiguous():
    ids = _streams(200)
    ring = ring_tokens(16)
    groups = split_streams(ids, ring)
    for g in groups:
        toks = [token_of(s) for s in g]
        # within a non-wraparound group tokens fall in one ring range;
        # the wraparound group (first) may contain the tail+head merge
        if g is not groups[0]:
            lo, hi = min(toks), max(toks)
            spanned = [b for b in ring if lo <= b < hi]
            assert len(spanned) <= 1


def test_wraparound_merge():
    # ids above the last boundary land in the same group as ids below
    # the first boundary (Master.java:69-79,94-102)
    ring = ring_tokens(4)
    lo_id = next(s for s in _streams(5000, 1) if token_of(s) <= ring[0])
    hi_id = next(s for s in _streams(5000, 2) if token_of(s) > ring[-1])
    groups = split_streams([lo_id, hi_id], ring)
    assert len(groups) == 1
    assert set(groups[0]) == {lo_id, hi_id}


def test_empty_groups_dropped():
    ids = _streams(3)
    groups = split_streams(ids, ring_tokens(64))
    assert all(groups)
    assert len(groups) <= 3


def test_grouper_dense_and_deterministic():
    ids = _streams(50)
    g1 = StreamGrouper(8).groups_for(123, ids)
    g2 = StreamGrouper(8).groups_for(123, ids)
    assert g1 == g2
    assert set(g1.values()) == set(range(max(g1.values()) + 1))


def test_replay_end_to_end_under_vnode_token_grouping(spark, tmp_root):
    """D2 exercised through the full engine: the log is written with the
    faithful token-ring vnode grouping (split_streams incl. wraparound
    merge, Master.java:59-105) instead of the default index-stable
    groups, and replay must still match the oracle — group assignment is
    pure partitioning metadata, never semantics."""
    from scylla_cdc_java_spark import Engine, GenSpec, generate_world, write_world
    from scylla_cdc_java_spark.model import EngineConfig
    from scylla_cdc_java_spark.oracle import final_state, replay as oreplay

    spec = GenSpec(seed=13, n_events=1500, n_repos=30, paths_per_repo=8,
                   n_generations=2, streams_per_generation=8,
                   gen_span_ms=60_000)
    world = generate_world(spec)
    streams_by_gen = dict(world["generations"])
    grouper = StreamGrouper(n_ranges=6)

    def sg(gstart, sid):
        return grouper.group_of(gstart, sid, streams_by_gen[gstart])

    info = write_world(world, f"{tmp_root}/world_vnode", stream_group_of=sg)
    eng = Engine(
        spark, info["log_dir"], info["generations_path"],
        f"{tmp_root}/target_vnode",
        cfg=EngineConfig(window_length_limit_ms=60_000),
    )
    eng.replay()
    got = [
        {c: r[c] for c in ("repo", "path", "commit", "lang", "content")}
        for r in sorted(eng.sink.read().collect(),
                        key=lambda r: (r["repo"], r["path"]))
    ]
    want = [
        {k: v for k, v in r.items() if k != "content_sha256"}
        for r in final_state(oreplay(world["events"]))
    ]
    assert got == want


def test_tail_skips_generation_younger_than_30s(spark, tmp_root):
    """T7 age guard (GenerationsFetcher.java:88): live tail must not
    consume a generation younger than min_generation_age_ms — its
    stream list may still be incomplete."""
    from scylla_cdc_java_spark import Engine, GenSpec, generate_world, write_world
    from scylla_cdc_java_spark.model import EngineConfig

    spec = GenSpec(seed=17, n_events=300, n_repos=10, paths_per_repo=4,
                   n_generations=1, streams_per_generation=4,
                   gen_span_ms=60_000)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/world_age")
    gen0 = world["generations"][0][0]
    now = [gen0 + 10_000]  # generation is only 10 s old
    eng = Engine(
        spark, info["log_dir"], info["generations_path"],
        f"{tmp_root}/target_age", clock=lambda: now[0],
        cfg=EngineConfig(window_length_limit_ms=60_000),
    )
    assert eng._tail_step() is None  # guarded
    now[0] = gen0 + 31_000  # old enough now
    s = eng._tail_step()
    assert s is not None and s["rows"] > 0
