"""Feed-driven incremental aggregate — sinks/aggregate.py.

The additive rollup maintained ONLY from the change feed must equal a
direct GROUP BY over the table snapshot at every commit point, under
inserts, updates (including group-moving ones), deletes, NULL groups
and NULL metrics, crash-redelivery, folding, and compaction-only
spans. The delta-list-in-cursor-extra design is exercised directly:
an orphan delta file from a crashed sync is never read and is reaped
once superseded."""

import os

import pytest
from pyspark.sql import functions as F

from scylla_cdc_java_spark.model import (
    OP_ROW_DELETE,
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
    TableConfig,
)
from scylla_cdc_java_spark.operators.fold import fold_batch, normalize_log
from scylla_cdc_java_spark.sinks.aggregate import FeedAggregate
from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

SID = b"\x0d" * 16
COLS = ["repo", "path", "commit", "lang", "content"]

GROUPS = {"lang": "lang"}
METRICS = {"bytes": "length(content)"}


def _batch(spark, rows, columns=COLS):
    data = [
        (SID, {"ms": r["ms"], "seq": r["seq"]}, r["op"],
         *[r.get(c) for c in columns])
        for r in rows
    ]
    ddl = (
        "`cdc$stream_id` binary, `cdc$time` struct<ms:long,seq:long>, "
        "`cdc$operation` tinyint, "
        + ", ".join(f"`{c}` string" for c in columns)
    )
    return normalize_log(spark.createDataFrame(data, schema=ddl))


def _direct(sink):
    """The ground truth: the same rollup computed directly over the
    current table snapshot."""
    return {
        r["lang"]: (r["rows"], r["bytes"])
        for r in sink.read()
        .groupBy(F.expr("lang").alias("lang"))
        .agg(F.count(F.lit(1)).alias("rows"),
             F.sum(F.expr("length(content)")).alias("bytes"))
        .collect()
    }


def _got(agg):
    return {r["lang"]: (r["rows"], r["bytes"]) for r in agg.read().collect()}


def test_aggregate_tracks_table(spark, tmp_root):
    """Sync-by-sync equality with a direct GROUP BY, through inserts,
    a group-moving update, NULL metric values, a NULL group, and a
    group drained to zero (which must vanish from the rollup)."""
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/agg_t", table,
                            num_buckets=8)
    agg = FeedAggregate(spark, f"{tmp_root}/agg_t_state",
                        group_by=GROUPS, metrics=METRICS, fold_every=100)
    ins = {"op": OP_ROW_INSERT, "commit": "c0"}

    # batch 1: bootstrap — three langs, one NULL-content row, one
    # NULL-lang row
    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": 0, "repo": "o/r1", "path": "a.py",
         "lang": "py", "content": "aaaa"},
        {**ins, "ms": 10, "seq": 1, "repo": "o/r1", "path": "b.py",
         "lang": "py", "content": "bb"},
        {**ins, "ms": 10, "seq": 2, "repo": "o/r2", "path": "c.go",
         "lang": "go", "content": "ccc"},
        {**ins, "ms": 10, "seq": 3, "repo": "o/r2", "path": "d.rs",
         "lang": "rs", "content": None},
        {**ins, "ms": 10, "seq": 4, "repo": "o/r3", "path": "e",
         "lang": None, "content": "e"},
    ]), table), {"step": 1})
    agg.sync(sink)
    assert _got(agg) == _direct(sink)
    assert _got(agg)["py"] == (2, 6)
    assert _got(agg)["rs"] == (1, None)  # all-NULL metric stays NULL
    assert _got(agg)[None] == (1, 1)

    # batch 2: group-moving update (py -> go), value update within a
    # group, a delete draining `rs` entirely, and a fresh insert
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "o/r1",
         "path": "a.py", "lang": "go"},
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": 1, "repo": "o/r2",
         "path": "c.go", "content": "cccccc"},
        {"op": OP_ROW_DELETE, "ms": 20, "seq": 2, "repo": "o/r2",
         "path": "d.rs"},
        {**ins, "ms": 20, "seq": 3, "repo": "o/r4", "path": "f.py",
         "lang": "py", "content": "ff"},
    ]), table), {"step": 2})
    agg.sync(sink)
    direct = _direct(sink)
    assert _got(agg) == direct
    assert "rs" not in direct  # drained group vanished
    assert direct["go"] == (2, 10)  # moved row + grown content

    # batch 3: delete everything left in `go`
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_DELETE, "ms": 30, "seq": 0, "repo": "o/r1",
         "path": "a.py"},
        {"op": OP_ROW_DELETE, "ms": 30, "seq": 1, "repo": "o/r2",
         "path": "c.go"},
    ]), table), {"step": 3})
    agg.sync(sink)
    direct = _direct(sink)
    assert _got(agg) == direct
    assert "go" not in direct

    # caught-up sync: no new delta file, state unchanged
    before = agg._committed()
    agg.sync(sink)
    assert agg._committed() == before
    assert _got(agg) == _direct(sink)


def test_crash_between_delta_write_and_commit(spark, tmp_root):
    """A sync that dies after writing its delta file but before the
    cursor commit must not double-count: the orphan delta is never
    referenced, the recovering sync re-polls the superset span, and
    the rollup equals the direct GROUP BY. The orphan is reaped once
    superseded."""
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/agg_c", table,
                            num_buckets=4)
    agg = FeedAggregate(spark, f"{tmp_root}/agg_c_state",
                        group_by=GROUPS, metrics=METRICS, fold_every=100)
    ins = {"op": OP_ROW_INSERT, "commit": "c0"}
    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": 0, "repo": "o/r1", "path": "a.py",
         "lang": "py", "content": "aaaa"},
    ]), table), {"step": 1})
    agg.sync(sink)

    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 20, "seq": 0, "repo": "o/r2", "path": "b.py",
         "lang": "py", "content": "bb"},
    ]), table), {"step": 2})

    # crash simulation: the commit raises AFTER the delta file landed
    from scylla_cdc_java_spark.sinks import changefeed as cf

    real_commit = cf.ChangeFeedCursor.commit

    def boom(self, token, extra=None):
        raise RuntimeError("crash before commit")

    cf.ChangeFeedCursor.commit = boom
    try:
        with pytest.raises(RuntimeError, match="crash before commit"):
            agg.sync(sink)
    finally:
        cf.ChangeFeedCursor.commit = real_commit

    orphan_v = sink.snapshots()[-1]
    assert os.path.exists(agg._delta_path(orphan_v))
    assert orphan_v not in agg._committed()["deltas"]
    # the orphan is invisible: the rollup still reflects sync #1 only
    assert _got(agg)["py"] == (1, 4)

    # a third batch makes the recovery span a STRICT superset of the
    # crashed one — the strongest double-count trap
    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 30, "seq": 0, "repo": "o/r3", "path": "c.py",
         "lang": "py", "content": "ccc"},
    ]), table), {"step": 3})
    agg.sync(sink)
    assert _got(agg) == _direct(sink)
    assert _got(agg)["py"] == (3, 9)
    # superseded orphan reaped by the post-commit GC
    assert not os.path.exists(agg._delta_path(orphan_v))


def test_fold_and_gc(spark, tmp_root):
    """Every fold_every syncs the deltas fold into a versioned base:
    the answer is unchanged, the delta list resets, and superseded
    files are reaped."""
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/agg_f", table,
                            num_buckets=4)
    agg = FeedAggregate(spark, f"{tmp_root}/agg_f_state",
                        group_by=GROUPS, metrics=METRICS, fold_every=2)
    ins = {"op": OP_ROW_INSERT, "commit": "c0"}
    for i in range(4):
        sink.merge(fold_batch(_batch(spark, [
            {**ins, "ms": 10 * (i + 1), "seq": 0, "repo": f"o/r{i}",
             "path": "a.py", "lang": "py", "content": "x" * (i + 1)},
        ]), table), {"step": i + 1})
        agg.sync(sink)
        assert _got(agg) == _direct(sink)

    st = agg._committed()
    assert st["base"] is not None and st["deltas"] == []
    assert os.path.isdir(agg._base_path(st["base"]))
    # exactly one base survives, zero deltas — everything else reaped
    assert os.listdir(os.path.join(agg.path, "base")) == [
        f"v{st['base']}"]
    deltas_dir = os.path.join(agg.path, "deltas")
    assert not os.path.isdir(deltas_dir) or os.listdir(deltas_dir) == []
    assert _got(agg)["py"] == (4, 1 + 2 + 3 + 4)


def test_compaction_only_span_is_neutral(spark, tmp_root):
    """A span covering only a compaction commit diffs to an empty
    feed; the sync commits the position with an empty delta and the
    rollup is unchanged."""
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/agg_n", table,
                            num_buckets=4)
    agg = FeedAggregate(spark, f"{tmp_root}/agg_n_state",
                        group_by=GROUPS, metrics=METRICS)
    ins = {"op": OP_ROW_INSERT, "commit": "c0"}
    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": 0, "repo": "o/r1", "path": "a.py",
         "lang": "py", "content": "aa"},
    ]), table), {"step": 1})
    # second segment in the same bucket's partition key so compaction
    # actually has something to collapse (single-segment is a no-op)
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "o/r1",
         "path": "a.py", "content": "aa"},
    ]), table), {"step": 2})
    agg.sync(sink)
    sink.compact()
    assert sink.manifest()["version"] > agg.position()
    agg.sync(sink)
    assert agg.position() == sink.snapshots()[-1]
    assert _got(agg) == _direct(sink) == {"py": (1, 2)}


def test_reserved_and_conflicting_names_raise(spark, tmp_root):
    with pytest.raises(ValueError, match="reserved"):
        FeedAggregate(spark, f"{tmp_root}/agg_x", group_by={"rows": "lang"})
    with pytest.raises(ValueError, match="both group and metric"):
        FeedAggregate(spark, f"{tmp_root}/agg_y",
                      group_by={"lang": "lang"},
                      metrics={"lang": "length(lang)"})
    with pytest.raises(FileNotFoundError, match="run sync"):
        FeedAggregate(spark, f"{tmp_root}/agg_z",
                      group_by=GROUPS, metrics=METRICS).read()


def test_engine_replay_matches_direct_groupby(spark, tmp_root):
    """End-to-end over the real engine: replay a generated world
    window-by-window with the aggregate synced after EVERY window
    (the deployment cadence), folding en route; the final rollup
    equals a direct GROUP BY over the final table."""
    from scylla_cdc_java_spark import (
        Engine, EngineConfig, GenSpec, generate_world, write_world,
    )

    spec = GenSpec(seed=31, n_events=900, n_repos=20, paths_per_repo=5,
                   n_generations=2, streams_per_generation=4,
                   gen_span_ms=300_000)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/agg_e_world")
    target = f"{tmp_root}/agg_e_target"
    eng = Engine(spark, info["log_dir"], info["generations_path"], target,
                 cfg=EngineConfig(window_length_limit_ms=30_000))
    agg = FeedAggregate(spark, f"{tmp_root}/agg_e_state",
                        group_by=GROUPS, metrics=METRICS, fold_every=3)
    real_merge = eng.sink.merge

    def merge_and_sync(*a, **kw):
        stats = real_merge(*a, **kw)
        agg.sync(eng.sink)
        return stats

    eng.sink.merge = merge_and_sync
    eng.replay()
    eng.sink.merge = real_merge
    agg.sync(eng.sink)
    assert _got(agg) == _direct(eng.sink)


def test_external_aggregate_maintainer_during_replay(spark, tmp_root):
    """The deployment shape: ``tools/index_maintainer.py --kind
    aggregate`` in a SEPARATE OS process keeps the feed-driven rollup
    in lockstep while the engine replays a multi-window world (with
    the writer's piggyback compaction racing it). Zero coordination —
    the cursor's snapshot leases protect its resume point, a sync
    racing a commit is caught up by the next poll. Determinism uses
    the same watermark clock gate as the incremental-index maintainer
    test: the writer is HELD mid-log until the maintainer's out-file
    proves a live data-bearing sync, then released."""
    import json
    import subprocess
    import sys
    import threading
    import time

    from scylla_cdc_java_spark import (
        Engine, EngineConfig, GenSpec, generate_world, write_world,
    )

    REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = GenSpec(seed=37, n_events=2500, n_repos=25, paths_per_repo=8,
                   n_generations=2, streams_per_generation=4,
                   gen_span_ms=300_000, p_range_delete=0.05)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/am_world")
    target = f"{tmp_root}/am_target"
    state_dir = f"{tmp_root}/am_rollup"
    out = f"{tmp_root}/am_maintainer.jsonl"
    t0 = spec.gen0_start_ms
    gate = {"ms": t0 + 150_000}

    def read_rounds():
        if not os.path.exists(out):
            return []
        with open(out) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    proc = subprocess.Popen(
        [sys.executable,
         os.path.join(REPO_ROOT, "tools", "index_maintainer.py"),
         target, state_dir, "--kind", "aggregate", "--interval", "0.3",
         "--until-done", "--max-rounds", "400", "--cores", "2",
         "--out", out],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        eng = Engine(
            spark, info["log_dir"], info["generations_path"], target,
            clock=lambda: gate["ms"],
            cfg=EngineConfig(window_length_limit_ms=20_000,
                             compact_threshold=8, sleep_scale=0.01),
        )
        res: dict = {}

        def run_replay():
            try:
                res["stats"] = eng.replay()
            except BaseException as exc:
                res["exc"] = exc

        th = threading.Thread(target=run_replay, daemon=True)
        th.start()
        deadline = time.time() + 240
        saw_live = False
        while time.time() < deadline and proc.poll() is None:
            if any(r.get("changed") and not r.get("writer_done")
                   for r in read_rounds()):
                saw_live = True
                break
            time.sleep(0.2)
        gate["ms"] = t0 + 2 * spec.gen_span_ms + 100_000
        th.join(timeout=300)
        assert not th.is_alive(), "replay did not finish after release"
        if "exc" in res:
            raise res["exc"]
        assert saw_live, read_rounds()
        assert res["stats"].windows >= 10, res["stats"].windows
        proc.wait(timeout=300)
    finally:
        gate["ms"] = t0 + 2 * spec.gen_span_ms + 100_000
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    assert proc.returncode == 0

    rounds = read_rounds()
    assert rounds and rounds[-1]["writer_done"]
    assert rounds[-1]["changed"] == 0 and rounds[-1]["removed"] == 0
    # tracked a MOVING table: a data-bearing sync landed while the
    # writer was provably live, and a later version was synced after
    live = [r for r in rounds
            if r.get("changed") and not r.get("writer_done")]
    assert live, [(r.get("changed"), r.get("writer_done"))
                  for r in rounds]
    versions = {r["table_version"] for r in rounds if r.get("changed")}
    assert len(versions) >= 2, rounds

    # the externally-maintained rollup equals a direct GROUP BY over
    # the final table; an in-process catch-up sync is a no-op
    agg = FeedAggregate(spark, state_dir, group_by=GROUPS,
                        metrics=METRICS)
    s = agg.sync(eng.sink)
    assert s["changed"] == [] and s["removed"] == []
    assert _got(agg) == _direct(eng.sink)


def test_spec_pinning_and_extra_persistence(spark, tmp_root):
    """(a) The (group_by, metrics) spec is pinned to the state path —
    a mismatching spec must be refused loudly, since its delta files
    would be partials under a different algebra; (b) a cursor commit
    WITHOUT extra preserves the previously recorded payload, so a
    position-only confirmation can never silently orphan the delta
    list the position anchors."""
    from scylla_cdc_java_spark.sinks.changefeed import ChangeFeedCursor

    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/agg_s", table,
                            num_buckets=4)
    path = f"{tmp_root}/agg_s_state"
    agg = FeedAggregate(spark, path, group_by=GROUPS, metrics=METRICS)
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_INSERT, "commit": "c0", "ms": 10, "seq": 0,
         "repo": "o/r1", "path": "a.py", "lang": "py", "content": "aa"},
    ]), table), {"step": 1})
    agg.sync(sink)

    # same spec: reopens fine
    FeedAggregate(spark, path, group_by=GROUPS, metrics=METRICS)
    # different group set / metric expression: refused
    with pytest.raises(ValueError, match="spec mismatch"):
        FeedAggregate(spark, path, group_by={"repo": "repo"},
                      metrics=METRICS)
    with pytest.raises(ValueError, match="spec mismatch"):
        FeedAggregate(spark, path, group_by=GROUPS,
                      metrics={"bytes": "length(commit)"})

    # extra persists across a position-only commit
    cur = ChangeFeedCursor(sink, agg._cursor_path)
    before = cur.extra()
    assert before is not None and before["deltas"]
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_INSERT, "commit": "c0", "ms": 20, "seq": 0,
         "repo": "o/r2", "path": "b.py", "lang": "py", "content": "b"},
    ]), table), {"step": 2})
    feed, tok = cur.poll()
    assert feed is not None
    cur.commit(tok)  # position-only: no extra argument
    assert cur.extra() == before


def test_decimal_metric_survives_folds(spark, tmp_root):
    """SUM widens DecimalType precision; a fold that persisted the
    widened type would make the base unreadable under the pinned
    schema on the next resolve (wedging the aggregate permanently).
    The fold casts every metric back to its pinned delta type, so
    repeated folds keep working and stay exact."""
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/agg_d", table,
                            num_buckets=4)
    agg = FeedAggregate(
        spark, f"{tmp_root}/agg_d_state", group_by=GROUPS,
        metrics={"amt": "cast(length(content) as decimal(10,2))"},
        fold_every=2)
    ins = {"op": OP_ROW_INSERT, "commit": "c0"}
    for i in range(5):  # crosses two folds and leaves one loose delta
        sink.merge(fold_batch(_batch(spark, [
            {**ins, "ms": 10 * (i + 1), "seq": 0, "repo": f"o/r{i}",
             "path": "a.py", "lang": "py", "content": "x" * (i + 1)},
        ]), table), {"step": i + 1})
        agg.sync(sink)
        got = {r["lang"]: (r["rows"], r["amt"])
               for r in agg.read().collect()}
        want = {
            r["lang"]: (r["rows"], r["amt"])
            for r in sink.read()
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("rows"),
                 F.sum(F.expr(
                     "cast(length(content) as decimal(10,2))"))
                 .alias("amt"))
            .collect()
        }
        # compare decimals by value, not by (possibly widened) scale
        assert {k: (n, float(a)) for k, (n, a) in got.items()} == \
               {k: (n, float(a)) for k, (n, a) in want.items()}
    assert agg._committed()["base"] is not None  # folds really ran


def test_value_neutral_span_does_not_grow_delta_list(spark, tmp_root):
    """A compaction-only span writes a zero-group delta; the sync must
    advance the position WITHOUT appending it — an idle-but-compacting
    table must not creep toward pointless full-base folds. The empty
    file is reaped as an orphan."""
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/agg_v", table,
                            num_buckets=4)
    agg = FeedAggregate(spark, f"{tmp_root}/agg_v_state",
                        group_by=GROUPS, metrics=METRICS)
    ins = {"op": OP_ROW_INSERT, "commit": "c0"}
    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": 0, "repo": "o/r1", "path": "a.py",
         "lang": "py", "content": "aa"},
    ]), table), {"step": 1})
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "o/r1",
         "path": "a.py", "content": "aa"},
    ]), table), {"step": 2})
    agg.sync(sink)
    before = agg._committed()
    sink.compact()
    v_compact = sink.snapshots()[-1]
    assert v_compact > agg.position()
    agg.sync(sink)
    after = agg._committed()
    assert agg.position() == v_compact  # position advanced
    assert after == before  # ...but the delta list did not grow
    assert not os.path.exists(agg._delta_path(v_compact))  # orphan reaped
    assert _got(agg) == _direct(sink)
