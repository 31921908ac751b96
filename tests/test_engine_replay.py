"""End-to-end golden tests (SURVEY.md section 5.2-5.4): generated CDC
world -> engine replay -> final sink state must equal the pure-Python
oracle, including per-row content sha256 (BASELINE invariant)."""

import hashlib

import pytest

from scylla_cdc_java_spark import Engine, GenSpec, generate_world, write_world
from scylla_cdc_java_spark.model import EngineConfig
from scylla_cdc_java_spark.oracle import final_state, replay


def _engine_state(sink):
    rows = sink.read().collect()
    out = []
    for r in sorted(rows, key=lambda r: (r["repo"], r["path"])):
        d = {
            "repo": r["repo"],
            "path": r["path"],
            "commit": r["commit"],
            "lang": r["lang"],
            "content": r["content"],
        }
        d["content_sha256"] = (
            hashlib.sha256(d["content"].encode()).hexdigest()
            if d["content"] is not None
            else None
        )
        out.append(d)
    return out


def _run_world(spark, tmp_root, spec, tag, cfg=None):
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/world_{tag}")
    eng = Engine(
        spark,
        info["log_dir"],
        info["generations_path"],
        f"{tmp_root}/target_{tag}",
        cfg=cfg or EngineConfig(),
    )
    stats = eng.replay()
    return world, eng, stats


def _assert_matches_oracle(world, eng):
    oracle_rows = final_state(replay(world["events"]))
    engine_rows = _engine_state(eng.sink)
    okeys = [(r["repo"], r["path"]) for r in oracle_rows]
    ekeys = [(r["repo"], r["path"]) for r in engine_rows]
    assert ekeys == okeys, (
        f"key sets differ: engine-only={set(ekeys)-set(okeys)} "
        f"oracle-only={set(okeys)-set(ekeys)}"
    )
    for o, e in zip(oracle_rows, engine_rows):
        assert o == e, f"row mismatch for {(o['repo'], o['path'])}:\n o={o}\n e={e}"


@pytest.mark.parametrize("seed", [42, 7])
def test_replay_matches_oracle_small(spark, tmp_root, seed):
    # gen2 windows are crop-limited (only epoch-0 is exempt), so size the
    # cap to the generation span to replay it in one batch
    spec = GenSpec(seed=seed, n_events=2000, n_repos=40, paths_per_repo=12,
                   n_generations=2, streams_per_generation=8,
                   gen_span_ms=60_000)
    cfg = EngineConfig(window_length_limit_ms=60_000)
    world, eng, stats = _run_world(spark, tmp_root, spec, f"s{seed}", cfg)
    assert stats.rows > 0 and stats.generations == 2
    _assert_matches_oracle(world, eng)


def test_replay_hot_key_skew(spark, tmp_root):
    # extreme zipf: most events hit a handful of repos
    spec = GenSpec(seed=3, n_events=3000, n_repos=30, paths_per_repo=8,
                   zipf_a=1.05, n_generations=1, streams_per_generation=4)
    world, eng, _ = _run_world(spark, tmp_root, spec, "skew")
    _assert_matches_oracle(world, eng)


def test_replay_idempotent_rerun(spark, tmp_root):
    """Re-running replay after completion is a no-op (exactly-once /
    at-least-once redelivery, reference Worker.java:105-114)."""
    spec = GenSpec(seed=5, n_events=1000, n_repos=20, paths_per_repo=6,
                   n_generations=1, streams_per_generation=4)
    world, eng, _ = _run_world(spark, tmp_root, spec, "idem")
    state1 = _engine_state(eng.sink)
    stats2 = eng.replay()  # checkpoint says done
    assert stats2.windows == 0
    assert _engine_state(eng.sink) == state1


def test_resume_from_checkpoint_mid_log(spark, tmp_root):
    """Windowed multi-batch replay with small window cap == forced
    chaining through checkpoints; result must still match the oracle."""
    spec = GenSpec(seed=11, n_events=1500, n_repos=25, paths_per_repo=8,
                   n_generations=2, streams_per_generation=4,
                   gen_span_ms=120_000)
    cfg = EngineConfig(window_length_limit_ms=30_000)
    world, eng, stats = _run_world(spark, tmp_root, spec, "multi", cfg)
    assert stats.windows > 4  # really chained
    _assert_matches_oracle(world, eng)
