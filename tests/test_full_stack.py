"""The full deployment, SIX OS processes, zero coordination — the
complete round trip the engine supports, all at once:

    writer     Engine.replay: CDC log -> fold -> merge sink (CDC in)
    compactor  tools/compactor.py: compact + vacuum at MAXIMUM pressure
               (retain-snapshots 1 — every superseded snapshot is
               reaped as soon as leases allow)
    maintainer tools/index_maintainer.py: incremental MinHash index in
               lockstep with the moving table (derived state)
    mirror     tools/mirror_consumer.py: change-feed consumer
               materializing a downstream mirror (CDC out)
    rollup     tools/index_maintainer.py --kind aggregate: the
               NON-idempotent feed consumer (delta-list-in-cursor
               commits) maintaining a GROUP-BY rollup (derived state
               over CDC out)
    minmax     tools/index_maintainer.py --kind minmax: the
               snapshot-synced rollup with NON-INVERTIBLE metrics
               (per-(bucket, group) MIN/MAX/SUM partials re-derived
               for only the touched buckets — the metrics the feed
               structurally cannot carry)

No process knows any other exists. The maintainer's and mirror's bucket
reads survive the vacuum via cross-process read leases (file level);
the mirror's versioned change-feed reads survive it via the CURSOR
lease (snapshot level, sinks/changefeed.ChangeFeedCursor) — with
retain-snapshots 1, count-based retention alone would reap the
mirror's resume snapshot out from under it mid-campaign
(test_cursor_lagging_past_retention_fails_loudly proves exactly that
failure with leases disabled).

Final assertions: every daemon exits 0 at its fixpoint, the table is
oracle-exact, the mirror equals the table, the index equals a full
recompute, and both rollups equal a direct GROUP BY."""

import json
import os
import subprocess
import sys

from scylla_cdc_java_spark import Engine, GenSpec, generate_world, write_world
from scylla_cdc_java_spark.datapipe.incremental import IncrementalMinHashIndex
from scylla_cdc_java_spark.model import EngineConfig
from scylla_cdc_java_spark.oracle import final_state, replay
from scylla_cdc_java_spark.sinks.changefeed import ParquetMirror

from test_incremental import _collect_sigs, _full_recompute, _inc_view

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rows(df):
    return sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in df.collect()
    )


def test_writer_compactor_maintainer_mirror_rollup_minmax_sext(
        spark, tmp_root):
    spec = GenSpec(seed=36, n_events=2500, n_repos=25, paths_per_repo=8,
                   n_generations=2, streams_per_generation=4,
                   gen_span_ms=300_000, p_range_delete=0.05)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/quad_world")
    target = f"{tmp_root}/quad_target"
    index_dir = f"{tmp_root}/quad_index"
    mirror_dir = f"{tmp_root}/quad_mirror"
    rollup_dir = f"{tmp_root}/quad_rollup"
    minmax_dir = f"{tmp_root}/quad_minmax"
    c_out = f"{tmp_root}/quad_compactor.jsonl"
    m_out = f"{tmp_root}/quad_maintainer.jsonl"
    r_out = f"{tmp_root}/quad_mirror.jsonl"
    a_out = f"{tmp_root}/quad_rollup.jsonl"
    x_out = f"{tmp_root}/quad_minmax.jsonl"

    argv = {
        "compactor": [
            os.path.join(REPO_ROOT, "tools", "compactor.py"),
            target, "--interval", "1", "--max-rounds", "200",
            "--until-done", "--grace", "10", "--retain-snapshots", "1",
            # 10 s publication grace: consumers lease a listed head
            # within milliseconds, so this is still a ~10^4× margin —
            # but snapshots from the campaign's first half really do
            # get reaped mid-run (the retention pressure under test)
            "--reader-lease", "10",
            "--cores", "2", "--out", c_out],
        "maintainer": [
            os.path.join(REPO_ROOT, "tools", "index_maintainer.py"),
            target, index_dir, "--kind", "minhash", "--interval", "0.3",
            "--until-done", "--max-rounds", "400", "--cores", "2",
            "--out", m_out],
        "mirror": [
            os.path.join(REPO_ROOT, "tools", "mirror_consumer.py"),
            target, mirror_dir, "--interval", "0.3", "--until-done",
            "--max-rounds", "400", "--cores", "2", "--out", r_out],
        "rollup": [
            os.path.join(REPO_ROOT, "tools", "index_maintainer.py"),
            target, rollup_dir, "--kind", "aggregate",
            "--interval", "0.3", "--until-done", "--max-rounds", "400",
            "--cores", "2", "--out", a_out],
        "minmax": [
            os.path.join(REPO_ROOT, "tools", "index_maintainer.py"),
            target, minmax_dir, "--kind", "minmax",
            "--interval", "0.3", "--until-done", "--max-rounds", "400",
            "--cores", "2", "--out", x_out],
    }
    errs = {name: open(f"{tmp_root}/quad_{name}.err", "w")
            for name in argv}
    daemons = {
        name: subprocess.Popen(
            [sys.executable, *args], stdout=subprocess.DEVNULL,
            stderr=errs[name],
        )
        for name, args in argv.items()
    }
    try:
        eng = Engine(
            spark, info["log_dir"], info["generations_path"], target,
            # piggyback compaction OFF: every compaction/vacuum is the
            # external compactor's, racing every consumer's reads
            cfg=EngineConfig(window_length_limit_ms=20_000,
                             compact_threshold=10**6),
        )
        stats = eng.replay()
        assert stats.windows >= 10, stats.windows
        for p in daemons.values():
            p.wait(timeout=300)
    finally:
        for p in daemons.values():
            if p.poll() is None:
                p.kill()
                p.wait()
        for fh in errs.values():
            fh.close()
    for name, p in daemons.items():
        with open(f"{tmp_root}/quad_{name}.err") as fh:
            tail = fh.read()[-4000:]
        assert p.returncode == 0, (name, p.returncode, tail)

    # the compactor compacted AND vacuumed under everyone; the vacuum
    # pressure that matters to the mirror is the SNAPSHOT horizon:
    # with retain-snapshots 1, every superseded unleased manifest is
    # reaped, so far fewer snapshots remain than the writer committed
    # (without the cursor lease this exact setup reaps the mirror's
    # resume snapshot mid-campaign and the consumer dies — the
    # pre-lease failure mode)
    def _jsonl(path):
        with open(path) as fh:
            return [json.loads(line) for line in fh]

    c_rounds = _jsonl(c_out)
    assert any(r["compacted"] for r in c_rounds), \
        "external compactor never landed a compaction"
    assert len(eng.sink.snapshots()) < stats.windows, \
        "snapshot horizon was never vacuumed — no retention pressure"
    # both consumers tracked the MOVING table (synced before done)
    m_rounds = _jsonl(m_out)
    assert any(r["changed"] > 0 and not r["writer_done"]
               for r in m_rounds), m_rounds
    r_rounds = _jsonl(r_out)
    assert any(r["applied_rows"] > 0 and not r["writer_done"]
               for r in r_rounds), r_rounds

    # final table oracle-exact
    want = sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in final_state(replay(world["events"]))
    )
    got = _rows(eng.sink.read())
    assert got == want and len(got) > 0

    # the downstream mirror equals the table (CDC out, round-tripped)
    mirror = ParquetMirror(spark, mirror_dir)
    assert _rows(mirror.read()) == want

    # the derived index equals a full recompute over the final table
    idx = IncrementalMinHashIndex(spark, index_dir, text_col="content")
    assert _collect_sigs(_inc_view(idx)) == _collect_sigs(
        _full_recompute(eng.sink))

    # the rollup (non-idempotent feed consumer, its resume snapshot
    # protected across retain-snapshots-1 vacuums by the cursor lease)
    # equals a direct GROUP BY over the final table
    from pyspark.sql import functions as F

    from scylla_cdc_java_spark.sinks.aggregate import FeedAggregate

    a_rounds = _jsonl(a_out)
    assert any(r.get("changed", 0) > 0 and not r.get("writer_done")
               for r in a_rounds), a_rounds
    agg = FeedAggregate(spark, rollup_dir, group_by={"lang": "lang"},
                        metrics={"bytes": "length(content)"})
    got_roll = {r["lang"]: (r["rows"], r["bytes"])
                for r in agg.read().collect()}
    want_roll = {
        r["lang"]: (r["rows"], r["bytes"])
        for r in eng.sink.read()
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("rows"),
             F.sum(F.expr("length(content)")).alias("bytes"))
        .collect()
    }
    assert got_roll == want_roll

    # the non-invertible rollup (snapshot-synced partials, its bucket
    # reads protected across vacuums by file-level read leases) also
    # tracked the moving table and equals a direct GROUP BY
    from scylla_cdc_java_spark.sinks.aggregate import BucketAggregate

    x_rounds = _jsonl(x_out)
    assert any(r.get("changed", 0) > 0 and not r.get("writer_done")
               for r in x_rounds), x_rounds
    magg = BucketAggregate(
        spark, minmax_dir, group_by={"lang": "lang"},
        metrics={"min_bytes": ("min", "length(content)"),
                 "max_bytes": ("max", "length(content)"),
                 "sum_bytes": ("sum", "length(content)")},
    )
    got_mm = {r["lang"]: (r["rows"], r["min_bytes"], r["max_bytes"],
                          r["sum_bytes"])
              for r in magg.read().collect()}
    want_mm = {
        r["lang"]: (r["rows"], r["min_bytes"], r["max_bytes"],
                    r["sum_bytes"])
        for r in eng.sink.read()
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("rows"),
             F.min(F.expr("length(content)")).alias("min_bytes"),
             F.max(F.expr("length(content)")).alias("max_bytes"),
             F.sum(F.expr("length(content)")).cast("int")
             .alias("sum_bytes"))
        .collect()
    }
    assert got_mm == want_mm
