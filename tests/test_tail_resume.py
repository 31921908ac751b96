"""Engine lifecycle edges surfaced by the round-5 review pass:

- ``replay()`` closes the OPEN generation at its footer max and marks
  ``done`` — but the generation can keep growing. The persisted
  ``gen_index`` must stay ON that generation so a later ``tail()``
  consumes post-replay appends (previously it advanced past it and the
  appended events became unreachable the moment a next generation
  appeared — silent loss).
- ``stream_groups=[]`` is an explicit "owns nothing" assignment (a
  fleet driver sharding N groups over k>N engines hands some engines an
  empty list); truthiness-mapping it to None made those engines replay
  EVERYTHING, breaking shard disjointness.
- footer-stats caches must not permanently poison on a file whose
  footer was unreadable once (listed mid-write in live tail).
"""

import os

from scylla_cdc_java_spark import Engine, GenSpec, generate_world, write_world
from scylla_cdc_java_spark.model import EngineConfig, TableConfig
from scylla_cdc_java_spark.oracle import final_state, replay

TBL = TableConfig(
    name="docs_tail",
    partition_key=("repo",),
    clustering_key=("path",),
    value_columns=("content",),
)
GEN0 = 1_700_000_000_000
SID = b"T" * 16
LOG_DDL = (
    "`cdc$stream_id` binary, `cdc$time` struct<ms:long,seq:long>, "
    "`cdc$operation` tinyint, `cdc$ttl` long, "
    "repo string, path string, content string, "
    "`cdc$deleted_content` boolean, "
    "generation long, stream_group int, time_bucket long"
)


def _append_log(spark, log_dir, evs):
    rows = [
        (SID, {"ms": e["ms"], "seq": e["seq"]}, e["op"], None,
         e["repo"], e["path"], e.get("content"), None,
         GEN0, 0, e["ms"] // 600_000)
        for e in evs
    ]
    (spark.createDataFrame(rows, schema=LOG_DDL)
     .write.mode("append")
     .partitionBy("generation", "stream_group", "time_bucket")
     .parquet(log_dir))


def test_tail_resumes_open_generation_after_replay_done(spark, tmp_root):
    log_dir = f"{tmp_root}/tr_log"
    gpath = f"{tmp_root}/tr_gens.parquet"
    spark.createDataFrame(
        [(GEN0, [SID])], schema="time long, streams array<binary>"
    ).coalesce(1).write.mode("overwrite").parquet(gpath)

    batch1 = [
        {"op": 2, "ms": GEN0 + 1000 + i, "seq": i, "repo": "o/r1",
         "path": f"p{i}", "content": f"v{i}"}
        for i in range(3)
    ]
    _append_log(spark, log_dir, batch1)

    cfg = EngineConfig(window_length_limit_ms=600_000, num_buckets=4)
    eng = Engine(spark, log_dir, gpath, f"{tmp_root}/tr_target",
                 table=TBL, cfg=cfg)
    eng.replay()
    ck = eng.sink.checkpoint()
    assert ck["done"] is True
    # the open generation stays addressable: gen_index points AT it
    assert ck["gen_index"] == 0
    assert eng.sink.read().count() == 3

    # re-replay on done is still the documented no-op
    assert eng.replay().windows == 0

    # the generation keeps growing AFTER the batch replay finished
    batch2 = [
        {"op": 2, "ms": GEN0 + 50_000, "seq": 0, "repo": "o/r1",
         "path": "p9", "content": "late"},
        {"op": 1, "ms": GEN0 + 50_001, "seq": 1, "repo": "o/r1",
         "path": "p0", "content": "updated"},
    ]
    _append_log(spark, log_dir, batch2)

    cfg2 = EngineConfig(window_length_limit_ms=600_000, num_buckets=4,
                        sleep_scale=0.0, min_generation_age_ms=0)
    eng2 = Engine(spark, log_dir, gpath, f"{tmp_root}/tr_target",
                  table=TBL, cfg=cfg2)
    eng2.clock = lambda: GEN0 + 10_000_000  # watermark far past the appends
    stats = eng2.tail(max_windows=4)
    assert stats.rows > 0, "tail consumed nothing after the appends"
    got = {(r["repo"], r["path"]): r["content"]
           for r in eng2.sink.read().collect()}
    assert got[("o/r1", "p9")] == "late"
    assert got[("o/r1", "p0")] == "updated"
    assert len(got) == 4


def test_empty_stream_groups_owns_nothing(spark, tmp_root):
    spec = GenSpec(seed=21, n_events=600, n_repos=12, paths_per_repo=4,
                   n_generations=1, streams_per_generation=4,
                   gen_span_ms=60_000)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/eg_world")
    cfg = EngineConfig(window_length_limit_ms=60_000, num_buckets=8)

    none_owner = Engine(
        spark, info["log_dir"], info["generations_path"],
        f"{tmp_root}/eg_none", cfg=cfg, stream_groups=[], shard_id="e0")
    stats = none_owner.replay()
    # checkpoint advanced (the shard reports progress/done for fleet
    # aggregation) but NO data was written and no group claimed
    assert stats.rows == 0
    root = none_owner.sink._load_root()
    assert len(root["bucket_index"]) == 0
    ck = none_owner.sink.checkpoint(shard="e0")
    assert ck is not None and ck.get("groups", {}) == {}

    # sanity contrast: the everything-owner produces the oracle state
    full = Engine(
        spark, info["log_dir"], info["generations_path"],
        f"{tmp_root}/eg_full", cfg=cfg)
    full.replay()
    assert full.sink.read().count() == len(
        final_state(replay(world["events"])))


def test_file_stats_cache_retries_unreadable_footer(spark, tmp_root):
    """An unreadable footer (file listed mid-write) must not be cached:
    once the file is fully written, stats (and with them row-cap
    cropping and footer-stats pruning) come back."""
    log_dir = f"{tmp_root}/fs_log"
    gpath = f"{tmp_root}/fs_gens.parquet"
    spark.createDataFrame(
        [(GEN0, [SID])], schema="time long, streams array<binary>"
    ).coalesce(1).write.mode("overwrite").parquet(gpath)
    _append_log(spark, log_dir, [
        {"op": 2, "ms": GEN0 + 1000, "seq": 0, "repo": "o/r1",
         "path": "p0", "content": "x"},
    ])
    eng = Engine(spark, log_dir, gpath, f"{tmp_root}/fs_target",
                 table=TBL, cfg=EngineConfig(num_buckets=4))

    tb = (GEN0 + 1000) // 600_000
    bdir = os.path.join(log_dir, f"generation={GEN0}", "stream_group=0",
                        f"time_bucket={tb}")
    half = os.path.join(bdir, "part-inflight.parquet")
    open(half, "w").close()  # zero-byte: unreadable footer

    start_ms, end_ms = GEN0, GEN0 + 600_000
    assert eng._window_file_stats(GEN0, start_ms, end_ms) is None

    # the "file" finishes writing: copy a real parquet over it
    real = [f for f in os.listdir(bdir)
            if f.endswith(".parquet") and f != "part-inflight.parquet"]
    assert real
    with open(os.path.join(bdir, real[0]), "rb") as src, \
            open(half, "wb") as dst:
        dst.write(src.read())
    stats = eng._window_file_stats(GEN0, start_ms, end_ms)
    assert stats is not None and len(stats) == 2, \
        "unreadable footer poisoned the stats cache"
