"""Task assignment (reference Task.java:9-27 / Worker fan-out): two
Engines owning disjoint stream-group subsets and separate targets must
together produce exactly the oracle's final state — the correctness
basis of the multi-process executor-fleet deployment."""

import hashlib

from scylla_cdc_java_spark import Engine, GenSpec, generate_world, write_world
from scylla_cdc_java_spark.model import EngineConfig
from scylla_cdc_java_spark.oracle import final_state, replay


def test_disjoint_stream_groups_union_matches_oracle(spark, tmp_root):
    spec = GenSpec(seed=13, n_events=3000, n_repos=50, paths_per_repo=10,
                   n_generations=2, streams_per_generation=16,
                   gen_span_ms=60_000)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/world_fleet")
    cfg = EngineConfig(window_length_limit_ms=60_000)
    n_groups = 8  # streams_per_generation // 2 (write_world default)
    engines = []
    for e in range(2):
        groups = [g for g in range(n_groups) if g % 2 == e]
        eng = Engine(spark, info["log_dir"], info["generations_path"],
                     f"{tmp_root}/fleet_target_{e}", cfg=cfg,
                     stream_groups=groups)
        stats = eng.replay()
        assert stats.rows > 0
        engines.append(eng)

    rows = []
    for eng in engines:
        rows += [
            {
                "repo": r["repo"], "path": r["path"], "commit": r["commit"],
                "lang": r["lang"], "content": r["content"],
                "content_sha256": hashlib.sha256(r["content"].encode()).hexdigest()
                if r["content"] is not None else None,
            }
            for r in eng.sink.read().collect()
        ]
    rows.sort(key=lambda r: (r["repo"], r["path"]))
    oracle_rows = final_state(replay(world["events"]))
    assert rows == oracle_rows


def test_salted_hot_group_shards_union_matches_oracle(spark, tmp_root):
    """Hot-group salting (Engine.group_salt): splitting one group into
    two clustering-key salt shards plus the remaining whole groups must
    still union to exactly the oracle state — tombstone ops replicate,
    write ops shard."""
    spec = GenSpec(seed=21, n_events=3000, n_repos=30, paths_per_repo=10,
                   zipf_a=1.4, n_generations=2, streams_per_generation=16,
                   gen_span_ms=60_000)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/world_salt")
    cfg = EngineConfig(window_length_limit_ms=60_000)
    n_groups = 8
    hot = 0  # split group 0 two ways; shard the rest round-robin
    shards = [
        dict(stream_groups=[g for g in range(1, n_groups) if g % 2 == 1],
             group_salt={hot: (2, 0)}),
        dict(stream_groups=[g for g in range(1, n_groups) if g % 2 == 0],
             group_salt={hot: (2, 1)}),
    ]
    rows = []
    for e, sh in enumerate(shards):
        eng = Engine(spark, info["log_dir"], info["generations_path"],
                     f"{tmp_root}/salt_target_{e}", cfg=cfg, **sh)
        eng.replay()
        rows += [
            {
                "repo": r["repo"], "path": r["path"], "commit": r["commit"],
                "lang": r["lang"], "content": r["content"],
                "content_sha256": hashlib.sha256(r["content"].encode()).hexdigest()
                if r["content"] is not None else None,
            }
            for r in eng.sink.read().collect()
        ]
    assert len(rows) == len({(r["repo"], r["path"]) for r in rows}), \
        "salt shards overlap in keys"
    rows.sort(key=lambda r: (r["repo"], r["path"]))
    oracle_rows = final_state(replay(world["events"]))
    assert rows == oracle_rows
