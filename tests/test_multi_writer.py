"""Multi-writer shared target: N sharded consumers -> ONE lake table.

The reference fans a generation's stream tasks out to concurrent
workers that all write to the same destination cluster (worker/
Worker.java:135-139; the DB serializes their writes). The round-3 fleet
sharded consumers into SEPARATE targets unioned at read time; with
serializable cross-process commits (COMMIT.lock + rebase) the shards
can now consume into one shared table: each ``Engine(shard_id=...)``
merge appends its own delta segments, and its checkpoint lives under
its own shard key — replaced only by its owner, so concurrent shards'
lineage never clobbers (``ParquetMergeSink._merge_shard_checkpoint``).
Disjoint stream-group subsets shard the key space (a partition key maps
to exactly one stream per generation), so shards never write the same
key in a generation; LWW resolution makes even that safe.
"""

import hashlib
import threading

from scylla_cdc_java_spark import Engine, GenSpec, generate_world, write_world
from scylla_cdc_java_spark.model import (
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
    EngineConfig,
    TableConfig,
)
from scylla_cdc_java_spark.operators.fold import fold_batch, normalize_log
from scylla_cdc_java_spark.oracle import final_state, replay
from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

N_GROUPS = 8  # streams_per_generation=16 // 2 (write_world default)


def _oracle(world):
    return final_state(replay(world["events"]))


def _table_rows(sink):
    return sorted(
        (
            {
                "repo": r["repo"], "path": r["path"], "commit": r["commit"],
                "lang": r["lang"], "content": r["content"],
                "content_sha256":
                    hashlib.sha256(r["content"].encode()).hexdigest()
                    if r["content"] is not None else None,
            }
            for r in sink.read().collect()
        ),
        key=lambda r: (r["repo"], r["path"]),
    )


SID_EVO = b"\x0d" * 16


def _evo_batch(spark, rows, columns):
    data = [
        (SID_EVO, {"ms": r["ms"], "seq": r["seq"]}, r["op"],
         *[r.get(c) for c in columns])
        for r in rows
    ]
    ddl = (
        "`cdc$stream_id` binary, `cdc$time` struct<ms:long,seq:long>, "
        "`cdc$operation` tinyint, "
        + ", ".join(f"`{c}` string" for c in columns)
    )
    return normalize_log(spark.createDataFrame(data, schema=ddl))


def _hook_before_commit(sink, action):
    """Run ``action()`` right before ``sink``'s next commit critical
    section — AFTER its Spark output staged, BEFORE its metadata rebase
    (the window in which a concurrent commit can land)."""
    orig = sink._commit_under_lock
    fired = [False]

    def wrapper(build, snapshot=True, **kw):
        if not fired[0]:
            fired[0] = True
            action()
        sink._commit_under_lock = orig
        return orig(build, snapshot=snapshot, **kw)

    sink._commit_under_lock = wrapper


def test_concurrent_schema_evolution_both_interleavings(spark, tmp_root):
    """Two shard writers concurrently add DIFFERENT new columns to one
    shared table (the reference tolerates add/drop implicitly while
    several workers run, replicator Main.java:141 — per-row column
    enumeration; here the commit rebase must union ``value_columns``).
    Driven deterministically through BOTH interleavings: writer B's
    commit lands inside writer A's stage->commit window, then vice
    versa. Both columns and both shards' cells must survive either
    order, and a fresh reader sees the union schema."""
    table = TableConfig()
    for flip in (False, True):
        path = f"{tmp_root}/evo_mw_{int(flip)}"
        a = ParquetMergeSink(spark, path, table, num_buckets=4)
        b = ParquetMergeSink(spark, path, table, num_buckets=4)
        # seed batch: shared base schema
        a.merge(fold_batch(_evo_batch(spark, [
            {"op": OP_ROW_INSERT, "ms": 10, "seq": 0, "repo": "o/r1",
             "path": "a.py", "commit": "c1", "lang": "py", "content": "x1"},
            {"op": OP_ROW_INSERT, "ms": 10, "seq": 1, "repo": "o/r2",
             "path": "b.py", "commit": "c2", "lang": "py", "content": "x2"},
        ], ["repo", "path", "commit", "lang", "content"]), table),
            None, shard="A")

        first, second = (b, a) if flip else (a, b)
        first_col, second_col = (
            ("review_score", "size_bytes") if flip
            else ("size_bytes", "review_score")
        )

        def second_commits():
            second.merge(fold_batch(_evo_batch(spark, [
                {"op": OP_ROW_UPDATE, "ms": 21, "seq": 0, "repo": "o/r2",
                 "path": "b.py", second_col: "B-val"},
            ], ["repo", "path", second_col]), table),
                None, shard="B" if flip else "A")

        # `second`'s evolved commit lands while `first`'s evolved batch
        # sits staged-but-uncommitted -> first's rebase must union it
        _hook_before_commit(first, second_commits)
        first.merge(fold_batch(_evo_batch(spark, [
            {"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "o/r1",
             "path": "a.py", first_col: "A-val"},
        ], ["repo", "path", first_col]), table),
            None, shard="A" if flip else "B")

        fresh = ParquetMergeSink.for_existing(spark, path)
        vcols = fresh.manifest()["value_columns"]
        assert "size_bytes" in vcols and "review_score" in vcols, vcols
        rows = {r["path"]: r.asDict() for r in fresh.read().collect()}
        assert set(rows) == {"a.py", "b.py"}
        got = {
            "a.py": rows["a.py"][first_col],
            "b.py": rows["b.py"][second_col],
        }
        assert got == {"a.py": "A-val", "b.py": "B-val"}, (flip, got)
        # the column NOT written on each row reads NULL, base cells live
        assert rows["a.py"][second_col] is None
        assert rows["b.py"][first_col] is None
        assert rows["a.py"]["content"] == "x1"
        assert rows["b.py"]["content"] == "x2"
        # ...and compaction folds the mixed-schema segments exactly
        fresh.compact()
        rows = {r["path"]: r.asDict() for r in fresh.read().collect()}
        assert rows["a.py"][first_col] == "A-val"
        assert rows["b.py"][second_col] == "B-val"


def test_concurrent_schema_evolution_threaded_race(spark, tmp_root):
    """Same property under a real (nondeterministic) race: two threads
    each commit three batches carrying their own new column into one
    table; every column and every cell must survive whichever commit
    order the lock arbitration produces."""
    table = TableConfig()
    path = f"{tmp_root}/evo_mw_race"
    sinks = [ParquetMergeSink(spark, path, table, num_buckets=4)
             for _ in range(2)]
    cols = ["size_bytes", "review_score"]
    errs = []

    def run(i):
        try:
            for k in range(3):
                sinks[i].merge(fold_batch(_evo_batch(spark, [
                    {"op": OP_ROW_INSERT, "ms": 100 + 10 * k + i, "seq": 0,
                     "repo": f"o/w{i}", "path": f"f{k}.py",
                     "commit": f"c{i}{k}", cols[i]: f"v{i}.{k}"},
                ], ["repo", "path", "commit", cols[i]]), table),
                    None, shard=f"w{i}")
        except Exception as ex:
            errs.append(ex)

    ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    fresh = ParquetMergeSink.for_existing(spark, path)
    vcols = fresh.manifest()["value_columns"]
    assert "size_bytes" in vcols and "review_score" in vcols, vcols
    rows = {(r["repo"], r["path"]): r.asDict()
            for r in fresh.read().collect()}
    assert len(rows) == 6
    for i in range(2):
        for k in range(3):
            r = rows[(f"o/w{i}", f"f{k}.py")]
            assert r[cols[i]] == f"v{i}.{k}"
            assert r[cols[1 - i]] is None
            assert r["commit"] == f"c{i}{k}"


def test_two_shards_one_table_concurrent(spark, tmp_root):
    """Two Engines with disjoint stream groups replay CONCURRENTLY
    (threads -> real interleaved commits through the lock) into the
    same target. The single table must equal the oracle, and each
    shard's checkpoint must be independently complete."""
    spec = GenSpec(seed=41, n_events=3000, n_repos=50, paths_per_repo=10,
                   n_generations=2, streams_per_generation=16,
                   gen_span_ms=60_000)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/world_mw")
    target = f"{tmp_root}/mw_target"
    cfg = EngineConfig(window_length_limit_ms=60_000)

    engines = [
        Engine(spark, info["log_dir"], info["generations_path"], target,
               cfg=cfg, shard_id=f"e{e}",
               stream_groups=[g for g in range(N_GROUPS) if g % 2 == e])
        for e in range(2)
    ]
    errs = []

    def run(eng):
        try:
            eng.replay()
        except Exception as ex:  # surfaced below — don't swallow in thread
            errs.append(ex)

    threads = [threading.Thread(target=run, args=(e,)) for e in engines]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs

    sink = engines[0].sink
    assert _table_rows(sink) == _oracle(world)
    full = sink.checkpoint()
    assert set(full["shards"]) == {"e0", "e1"}
    assert full["done"] is True
    for e in range(2):
        sck = sink.checkpoint(shard=f"e{e}")
        assert sck["done"] is True
        assert sck["groups"], "shard stamped no lineage"
        owned = {int(g) for g in sck["groups"]}
        assert owned == {g for g in range(N_GROUPS) if g % 2 == e}


def test_salted_shards_share_one_table(spark, tmp_root):
    """Hot-group salting under the shared target: the hot group's
    tombstone ops replicate to BOTH salt shards, so the shared table
    receives each partition/range tombstone twice — monotone LWW and
    ts-shadowing must resolve the duplicates to the identical state
    (the sink's documented idempotency, now exercised across writers
    instead of across redeliveries)."""
    spec = GenSpec(seed=47, n_events=3000, n_repos=30, paths_per_repo=10,
                   zipf_a=1.4, n_generations=2, streams_per_generation=16,
                   gen_span_ms=60_000)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/world_mwsalt")
    target = f"{tmp_root}/mwsalt_target"
    cfg = EngineConfig(window_length_limit_ms=60_000)
    hot = 0
    shards = [
        dict(stream_groups=[g for g in range(1, N_GROUPS) if g % 2 == 1],
             group_salt={hot: (2, 0)}),
        dict(stream_groups=[g for g in range(1, N_GROUPS) if g % 2 == 0],
             group_salt={hot: (2, 1)}),
    ]
    engines = [
        Engine(spark, info["log_dir"], info["generations_path"], target,
               cfg=cfg, shard_id=f"s{e}", **sh)
        for e, sh in enumerate(shards)
    ]
    errs = []

    def run(eng):
        try:
            eng.replay()
        except Exception as ex:
            errs.append(ex)

    threads = [threading.Thread(target=run, args=(e,)) for e in engines]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    sink = engines[0].sink
    assert sink.checkpoint()["done"] is True
    assert _table_rows(sink) == _oracle(world)
    # maintenance over the doubly-delivered tombstones stays exact
    sink.compact()
    assert _table_rows(sink) == _oracle(world)


def test_tail_two_shards_interleaved(spark, tmp_root):
    """Live-tail path (_tail_step) under the shared target: two shard
    consumers poll the same log with the same injected clock and commit
    into one table, steps deterministically interleaved — covering the
    tail-side shard-checkpoint calls (skipped-window commit_checkpoint
    and merge) that replay() doesn't exercise."""
    spec = GenSpec(seed=53, n_events=1500, n_repos=25, paths_per_repo=8,
                   n_generations=1, streams_per_generation=16,
                   gen_span_ms=90_000)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/world_mwtail")
    target = f"{tmp_root}/mwtail_target"
    clk = {"t": spec.gen0_start_ms}
    cfg = EngineConfig(window_length_limit_ms=30_000, sleep_scale=0.0,
                       compact_threshold=10**6)
    engines = [
        Engine(spark, info["log_dir"], info["generations_path"], target,
               cfg=cfg, clock=lambda: clk["t"], shard_id=f"t{e}",
               stream_groups=[g for g in range(N_GROUPS) if g % 2 == e])
        for e in range(2)
    ]
    # march simulated time past the generation span + late window,
    # stepping each shard once per tick (interleaved commits)
    for _ in range(12):
        clk["t"] += 35_000
        for eng in engines:
            eng._tail_step()
    sink = engines[0].sink
    full = sink.checkpoint()
    assert set(full["shards"]) == {"t0", "t1"}
    for e in range(2):
        sck = sink.checkpoint(shard=f"t{e}")
        assert sck["last_ts"] > 0
        owned = {int(g) for g in sck["groups"]}
        # per-group lineage stamped onto OWNED groups only (subset of
        # the shard's assignment; only groups present on disk appear)
        assert owned and owned <= {g for g in range(N_GROUPS)
                                   if g % 2 == e}, owned
    assert _table_rows(sink) == _oracle(world)


def test_shard_crash_resumes_without_touching_peer(spark, tmp_root):
    """Shard e1 crashes mid-replay after its first commit; shard e0
    completes. A fresh e1 resumes from ITS OWN shard checkpoint (e0's
    lineage untouched) and the final shared table is oracle-exact."""
    spec = GenSpec(seed=43, n_events=2500, n_repos=40, paths_per_repo=8,
                   n_generations=2, streams_per_generation=16,
                   gen_span_ms=60_000)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/world_mwcr")
    target = f"{tmp_root}/mwcr_target"
    cfg = EngineConfig(window_length_limit_ms=20_000)

    def mk(e):
        return Engine(spark, info["log_dir"], info["generations_path"],
                      target, cfg=cfg, shard_id=f"e{e}",
                      stream_groups=[g for g in range(N_GROUPS)
                                     if g % 2 == e])

    e0 = mk(0)
    e0.replay()
    sink = e0.sink
    ck0 = sink.checkpoint(shard="e0")
    assert ck0["done"] is True
    assert sink.checkpoint()["done"] is True  # only e0 has checkpointed

    class _Stop(Exception):
        pass

    e1 = mk(1)
    orig = e1.sink.merge
    calls = [0]

    def bomb(fold, ckpt=None, **kw):
        st = orig(fold, ckpt, **kw)
        calls[0] += 1
        if calls[0] == 2:  # crash after the second committed window
            raise _Stop()
        return st

    e1.sink.merge = bomb
    try:
        e1.replay()
    except _Stop:
        pass
    mid = sink.checkpoint()
    assert mid["done"] is False            # e1 in flight
    assert mid["shards"]["e0"] == ck0      # peer lineage untouched
    assert not (sink.checkpoint(shard="e1") or {}).get("done")

    e1b = mk(1)
    stats = e1b.replay()
    assert stats.windows >= 1              # actually resumed mid-log
    assert sink.checkpoint()["done"] is True
    assert sink.checkpoint(shard="e0") == ck0
    assert _table_rows(sink) == _oracle(world)
