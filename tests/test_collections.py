"""W7 non-frozen collections (reference: UnpreparedUpdateOp, replicator
Main.java:203-276; list-index assignment
DRV/querybuilder/ListSetIdxTimeUUIDAssignment.java:24-27): a
map<string,string> column with element adds, per-element removals
(``cdc$deleted_elements_``), and whole-map overwrites (``cdc$deleted_``
marker = collection tombstone at ts-1). Engine fold is a JVM
explode -> per-(pk, element) hash agg -> map regroup; verified
end-to-end against the extended Python oracle."""

from dataclasses import replace

from scylla_cdc_java_spark import Engine, GenSpec, generate_world, write_world
from scylla_cdc_java_spark.model import EngineConfig, TableConfig
from scylla_cdc_java_spark.oracle import OracleState, apply_event, final_state, replay

TAGS_TABLE = TableConfig(collection_columns=("tags",))


def _engine_rows(sink, as_of_ms=None):
    return [
        {
            "repo": r["repo"], "path": r["path"], "commit": r["commit"],
            "lang": r["lang"], "content": r["content"],
            "tags": dict(r["tags"]) if r["tags"] is not None else None,
        }
        for r in sorted(sink.read(as_of_ms=as_of_ms).collect(),
                        key=lambda r: (r["repo"], r["path"]))
    ]


def _oracle_rows(st, as_of_ms=None):
    return [
        {k: v for k, v in r.items() if k != "content_sha256"}
        for r in final_state(st, as_of_ms=as_of_ms)
    ]


def test_collection_replay_matches_oracle(spark, tmp_root):
    spec = GenSpec(seed=31, n_events=2500, n_repos=30, paths_per_repo=8,
                   n_generations=2, streams_per_generation=8,
                   gen_span_ms=60_000, with_collections=True,
                   ttl_fraction=0.3)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/world_coll")
    eng = Engine(
        spark, info["log_dir"], info["generations_path"],
        f"{tmp_root}/target_coll", table=TAGS_TABLE,
        cfg=EngineConfig(window_length_limit_ms=60_000),
    )
    eng.replay()
    st = replay(world["events"], table=TAGS_TABLE)

    got = _engine_rows(eng.sink)
    want = _oracle_rows(st)
    assert len(got) == len(want)
    assert got == want
    # teeth: some rows must actually carry tags
    assert any(r["tags"] for r in got)

    # TTL expiry applies to collection elements too
    as_of = max(world["events"]["ms"]) + 30_000_000
    got2 = _engine_rows(eng.sink, as_of_ms=as_of)
    want2 = _oracle_rows(st, as_of_ms=as_of)
    assert got2 == want2


def test_collection_windowed_replay_matches_oracle(spark, tmp_root):
    """Multi-window chaining: element cells and collection tombstones
    must merge correctly across batches through the sink."""
    spec = GenSpec(seed=33, n_events=1500, n_repos=20, paths_per_repo=6,
                   n_generations=2, streams_per_generation=4,
                   gen_span_ms=120_000, with_collections=True)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/world_collw")
    eng = Engine(
        spark, info["log_dir"], info["generations_path"],
        f"{tmp_root}/target_collw", table=TAGS_TABLE,
        cfg=EngineConfig(window_length_limit_ms=30_000),
    )
    stats = eng.replay()
    assert stats.windows > 3
    st = replay(world["events"], table=TAGS_TABLE)
    assert _engine_rows(eng.sink) == _oracle_rows(st)


def test_collection_overwrite_and_removal_unit():
    """Overwrite at ts kills older elements but its OWN elements survive
    (tombstone at ts-1); element removal is a per-element LWW cell."""
    st = OracleState(table=TAGS_TABLE)
    ms0 = 1_700_000_000_000

    def ev(op, seq, **kw):
        return {"op": op, "ms": ms0, "seq": seq, "stream_id": b"s",
                "repo": "r/a", "path": "p", **kw}

    apply_event(st, ev(2, 1, content="x", tags={"a": "1", "b": "2"},
                       del_tags=True))
    apply_event(st, ev(1, 2, tags={"c": "3"}))  # add element
    row = st.visible_row("r/a", "p")
    assert row["tags"] == {"a": "1", "b": "2", "c": "3"}

    # remove element b
    apply_event(st, ev(1, 3, del_elements_tags=["b"]))
    assert st.visible_row("r/a", "p")["tags"] == {"a": "1", "c": "3"}

    # whole-map overwrite: old elements die, new ones live
    apply_event(st, ev(1, 4, tags={"z": "9"}, del_tags=True))
    assert st.visible_row("r/a", "p")["tags"] == {"z": "9"}

    # late (lower-ts) add loses against the overwrite tombstone
    apply_event(st, ev(1, 3, tags={"late": "L"}))
    assert st.visible_row("r/a", "p")["tags"] == {"z": "9"}


def test_default_world_unchanged_by_collection_flag():
    """with_collections=False must leave the /v2 RNG stream — and hence
    every cached world — bit-identical."""
    base = GenSpec(seed=42, n_events=500, n_repos=10, paths_per_repo=4)
    w1 = generate_world(base)
    w2 = generate_world(replace(base, with_collections=False))
    assert w1["events"]["content"] == w2["events"]["content"]
    assert w1["events"]["ms"] == w2["events"]["ms"]
    assert all(t is None for t in w1["events"]["tags"])
