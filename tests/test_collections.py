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


def test_collection_structured_tail_matches_oracle(spark, tmp_root):
    """The Structured Streaming path (readStream -> foreachBatch) must
    fold and merge collection columns identically to the batch engine."""
    from scylla_cdc_java_spark import StructuredTail

    spec = GenSpec(seed=35, n_events=1200, n_repos=20, paths_per_repo=6,
                   n_generations=1, streams_per_generation=4,
                   with_collections=True)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/world_colls")
    tail = StructuredTail(
        spark, info["log_dir"], f"{tmp_root}/target_colls",
        table=TAGS_TABLE, max_files_per_trigger=2,
    )
    n_batches = tail.run_available_now()
    assert n_batches >= 1
    st = replay(world["events"], table=TAGS_TABLE)
    assert _engine_rows(tail.sink) == _oracle_rows(st)


def test_collection_postimage_mode(spark, tmp_root):
    """Postimage rows bind the FULL collection (overwrite): op-9 apply
    must reproduce exactly the image's element set."""
    from scylla_cdc_java_spark.model import EngineConfig as EC

    ms0 = 1_700_000_000_000
    seq = [0]

    def ev(op, off, tags=None, del_tags=None, content=None):
        seq[0] += 1
        return {"op": op, "ms": ms0 + off, "seq": seq[0],
                "stream_id": b"S" * 16, "repo": "r/x", "path": "p",
                "commit": None, "lang": None, "content": content,
                "del_commit": None, "del_lang": None, "del_content": None,
                "tags": tags, "del_tags": del_tags,
                "del_elements_tags": None, "ttl": None}

    # delta ops interleaved with postimages; postimage mode consumes
    # only ops 9 (full row images) + deletes
    evs = [
        ev(2, 10, tags={"a": "1"}, content="c1"),
        ev(9, 11, tags={"a": "1"}, content="c1"),
        ev(1, 20, tags={"b": "2"}),
        ev(9, 21, tags={"a": "1", "b": "2"}, content="c1"),
        ev(1, 30, del_tags=True, tags={"z": "9"}),
        ev(9, 31, tags={"z": "9"}, content="c1"),
    ]
    import pyarrow as pa
    import pyarrow.dataset as pads

    rows = {
        "cdc$stream_id": pa.array([e["stream_id"] for e in evs], pa.binary()),
        "cdc$time": pa.StructArray.from_arrays(
            [pa.array([e["ms"] for e in evs], pa.int64()),
             pa.array([e["seq"] for e in evs], pa.int64())],
            names=["ms", "seq"],
        ),
        "cdc$operation": pa.array([e["op"] for e in evs], pa.int8()),
        "cdc$ttl": pa.array([e["ttl"] for e in evs], pa.int64()),
        "repo": pa.array([e["repo"] for e in evs]),
        "path": pa.array([e["path"] for e in evs]),
        "commit": pa.array([e["commit"] for e in evs], pa.string()),
        "lang": pa.array([e["lang"] for e in evs], pa.string()),
        "content": pa.array([e["content"] for e in evs], pa.string()),
        "cdc$deleted_commit": pa.array([None] * len(evs), pa.bool_()),
        "cdc$deleted_lang": pa.array([None] * len(evs), pa.bool_()),
        "cdc$deleted_content": pa.array([None] * len(evs), pa.bool_()),
        "tags": pa.array(
            [None if e["tags"] is None else list(e["tags"].items())
             for e in evs],
            pa.map_(pa.string(), pa.string()),
        ),
        "cdc$deleted_tags": pa.array([e["del_tags"] for e in evs], pa.bool_()),
        "cdc$deleted_elements_tags": pa.array(
            [e["del_elements_tags"] for e in evs], pa.list_(pa.string())
        ),
        "generation": pa.array([ms0] * len(evs), pa.int64()),
        "stream_group": pa.array([0] * len(evs), pa.int32()),
        "time_bucket": pa.array([e["ms"] // 600_000 for e in evs], pa.int64()),
    }
    out = f"{tmp_root}/pi_coll"
    pads.write_dataset(
        pa.table(rows), f"{out}/cdc_log", format="parquet",
        partitioning=pads.partitioning(
            pa.schema([("generation", pa.int64()), ("stream_group", pa.int32()),
                       ("time_bucket", pa.int64())]), flavor="hive"),
        existing_data_behavior="delete_matching",
    )
    gens = pa.table({"time": pa.array([ms0], pa.int64()),
                     "streams": pa.array([[b"S" * 16]], pa.list_(pa.binary()))})
    import pyarrow.parquet as pq
    pq.write_table(gens, f"{out}/generations.parquet")

    eng = Engine(spark, f"{out}/cdc_log", f"{out}/generations.parquet",
                 f"{out}/target", table=TAGS_TABLE,
                 cfg=EC(mode="postimage"))
    eng.replay()
    rows_out = eng.sink.read().collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    assert dict(r["tags"]) == {"z": "9"}
    assert r["content"] == "c1"


def test_collection_preimage_zero_mismatches(spark, tmp_root):
    """W8 × W7: preimage rows assert collection state too (the
    reference's checkPreimage walks every column of the row,
    Main.java:625-639). A consistent world must verify clean across
    windows — including tags."""
    from scylla_cdc_java_spark.images import with_images

    spec = GenSpec(seed=33, n_events=1200, n_repos=15, paths_per_repo=6,
                   n_generations=2, streams_per_generation=4,
                   gen_span_ms=90_000, with_collections=True)
    world = with_images(generate_world(spec), preimage_fraction=0.5,
                        postimage=False, table=TAGS_TABLE)
    # teeth: some preimage rows must actually assert a non-empty map
    assert any(
        op == 0 and tags
        for op, tags in zip(world["events"]["op"], world["events"]["tags"])
    )
    info = write_world(world, f"{tmp_root}/world_coll_pre")
    eng = Engine(
        spark, info["log_dir"], info["generations_path"],
        f"{tmp_root}/target_coll_pre", table=TAGS_TABLE,
        cfg=EngineConfig(mode="preimage", window_length_limit_ms=30_000),
    )
    stats = eng.replay()
    assert stats.windows > 1  # state must cross the batch boundary
    assert stats.preimage_mismatches == 0


def test_collection_preimage_detects_corruption(spark, tmp_root):
    """Corrupt sampled op-0 tag assertions: each corrupted map must be
    reported as a `tags` mismatch."""
    from scylla_cdc_java_spark.images import with_images

    spec = GenSpec(seed=34, n_events=800, n_repos=12, paths_per_repo=6,
                   n_generations=1, streams_per_generation=4,
                   gen_span_ms=60_000, with_collections=True)
    world = with_images(generate_world(spec), preimage_fraction=0.5,
                        postimage=False, table=TAGS_TABLE)
    ev = world["events"]
    corrupted = 0
    for i, op in enumerate(ev["op"]):
        if op == 0 and corrupted < 10:
            ev["tags"][i] = {"__bogus__": "corrupt"}  # never generated
            corrupted += 1
    assert corrupted
    info = write_world(world, f"{tmp_root}/world_coll_pre_bad")
    eng = Engine(
        spark, info["log_dir"], info["generations_path"],
        f"{tmp_root}/target_coll_pre_bad", table=TAGS_TABLE,
        cfg=EngineConfig(mode="preimage", window_length_limit_ms=60_000),
    )
    stats = eng.replay()
    assert stats.preimage_mismatches >= corrupted


def test_collection_purge_at_compaction_stays_exact(spark, tmp_root):
    """compact(expire_before_ms=E) on a collections world: expired
    elements, element tombstones, and collection tombstones below the
    bound are physically dropped; reads at/after E stay oracle-exact."""
    spec = GenSpec(seed=32, n_events=2500, n_repos=30, paths_per_repo=8,
                   n_generations=2, streams_per_generation=8,
                   gen_span_ms=60_000, with_collections=True,
                   ttl_fraction=0.3)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/world_collp")
    eng = Engine(
        spark, info["log_dir"], info["generations_path"],
        f"{tmp_root}/target_collp", table=TAGS_TABLE,
        cfg=EngineConfig(window_length_limit_ms=60_000),
    )
    eng.replay()
    st = replay(world["events"], table=TAGS_TABLE)
    E = max(world["events"]["ms"]) + 30_000_000
    eng.sink.compact(list(range(eng.sink.num_buckets)), expire_before_ms=E)
    assert _engine_rows(eng.sink, as_of_ms=E) == _oracle_rows(st, as_of_ms=E)
    far = E + 70_000_000
    assert _engine_rows(eng.sink, as_of_ms=far) == _oracle_rows(
        st, as_of_ms=far)
