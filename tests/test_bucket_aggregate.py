"""Snapshot-synced incremental GROUP BY with non-invertible metrics —
sinks/aggregate.py::BucketAggregate.

The per-(bucket, group) partials maintained by touched-bucket rescan
must equal a direct GROUP BY over the table snapshot after every sync,
under the case the feed-driven rollup structurally cannot handle:
deleting or updating away the current MIN/MAX, whose new value only a
rescan can know. Touch-scoping (only changed buckets rescanned), spec
pinning, restart, and the drained-table edge are asserted directly."""

import pytest
from pyspark.sql import functions as F

from scylla_cdc_java_spark.model import (
    OP_ROW_DELETE,
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
    TableConfig,
)
from scylla_cdc_java_spark.operators.fold import fold_batch, normalize_log
from scylla_cdc_java_spark.sinks.aggregate import BucketAggregate
from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

SID = b"\x0e" * 16
COLS = ["repo", "path", "commit", "lang", "content"]

GROUPS = {"lang": "lang"}
METRICS = {
    "min_bytes": ("min", "length(content)"),
    "max_bytes": ("max", "length(content)"),
    "sum_bytes": ("sum", "length(content)"),
}


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
    """Ground truth: the same rollup computed directly over the table."""
    return {
        r["lang"]: (r["rows"], r["min_bytes"], r["max_bytes"],
                    r["sum_bytes"])
        for r in sink.read()
        .groupBy(F.expr("lang").alias("lang"))
        .agg(F.count(F.lit(1)).alias("rows"),
             F.min(F.expr("length(content)")).alias("min_bytes"),
             F.max(F.expr("length(content)")).alias("max_bytes"),
             F.sum(F.expr("length(content)")).cast("int")
             .alias("sum_bytes"))
        .collect()
    }


def _got(agg):
    return {
        r["lang"]: (r["rows"], r["min_bytes"], r["max_bytes"],
                    r["sum_bytes"])
        for r in agg.read().collect()
    }


def test_bucket_aggregate_tracks_table(spark, tmp_root):
    """Sync-by-sync equality with a direct GROUP BY through the
    non-invertible cases: the group MIN deleted (runner-up must
    surface), the group MAX updated smaller, NULL metrics, a NULL
    group, and a group drained to zero."""
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/bagg_t", table,
                            num_buckets=8)
    agg = BucketAggregate(spark, f"{tmp_root}/bagg_t_state",
                          group_by=GROUPS, metrics=METRICS)
    ins = {"op": OP_ROW_INSERT, "commit": "c0"}

    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": 0, "repo": "o/r1", "path": "a.py",
         "lang": "py", "content": "a"},
        {**ins, "ms": 10, "seq": 1, "repo": "o/r1", "path": "b.py",
         "lang": "py", "content": "bbbb"},
        {**ins, "ms": 10, "seq": 2, "repo": "o/r2", "path": "c.py",
         "lang": "py", "content": "cc"},
        {**ins, "ms": 10, "seq": 3, "repo": "o/r2", "path": "d.rs",
         "lang": "rs", "content": None},
        {**ins, "ms": 10, "seq": 4, "repo": "o/r3", "path": "e",
         "lang": None, "content": "eee"},
    ]), table), {"step": 1})
    agg.sync(sink)
    got = _got(agg)
    assert got == _direct(sink)
    assert got["py"] == (3, 1, 4, 7)
    assert got["rs"] == (1, None, None, None)  # all-NULL metric

    # delete the current py MIN ("a", len 1) and update the MAX
    # ("bbbb") down to len 3 — the feed-only rollup cannot know the
    # new extremes; the rescan must surface len-2 "cc" as min
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_DELETE, "ms": 20, "seq": 0, "repo": "o/r1",
         "path": "a.py"},
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": 1, "repo": "o/r1",
         "path": "b.py", "content": "bbb"},
    ]), table), {"step": 2})
    agg.sync(sink)
    direct = _direct(sink)
    assert _got(agg) == direct
    assert direct["py"] == (2, 2, 3, 5)

    # drain rs entirely; it must vanish from the rollup
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_DELETE, "ms": 30, "seq": 0, "repo": "o/r2",
         "path": "d.rs"},
    ]), table), {"step": 3})
    agg.sync(sink)
    got = _got(agg)
    assert got == _direct(sink)
    assert "rs" not in got


def test_bucket_aggregate_touch_scoped_and_restart(spark, tmp_root):
    """A sync after a one-partition-key change rescans only that key's
    bucket; a fresh object on the same path (process restart) serves
    the same state and keeps maintaining it."""
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/bagg_s", table,
                            num_buckets=16)
    agg = BucketAggregate(spark, f"{tmp_root}/bagg_s_state",
                          group_by=GROUPS, metrics=METRICS)
    ins = {"op": OP_ROW_INSERT, "commit": "c0"}
    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": i, "repo": f"o/r{i}", "path": "f.py",
         "lang": "py", "content": "x" * (i + 1)}
        for i in range(12)
    ]), table), {"step": 1})
    first = agg.sync(sink)
    assert len(first["changed"]) > 1  # bootstrap saw many buckets

    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "o/r3",
         "path": "f.py", "content": "yy"},
    ]), table), {"step": 2})
    res = BucketAggregate(  # restart: fresh object, same state path
        spark, f"{tmp_root}/bagg_s_state",
        group_by=GROUPS, metrics=METRICS,
    ).sync(sink)
    # one partition key changed -> exactly its bucket rescanned
    assert len(res["changed"]) == 1
    assert _got(agg) == _direct(sink)


def test_bucket_aggregate_spec_pinned(spark, tmp_root):
    """A mismatching (group_by, metrics) spec on an existing state
    path refuses loudly — partials are only meaningful under one
    spec. Unsupported agg fns refuse at construction."""
    path = f"{tmp_root}/bagg_spec"
    BucketAggregate(spark, path, group_by=GROUPS, metrics=METRICS)
    with pytest.raises(ValueError, match="spec mismatch"):
        BucketAggregate(spark, path, group_by=GROUPS,
                        metrics={"min_bytes": ("min", "length(repo)")})
    with pytest.raises(ValueError, match="unsupported agg fn"):
        BucketAggregate(spark, f"{tmp_root}/bagg_fn",
                        group_by=GROUPS,
                        metrics={"m": ("avg", "length(content)")})
    with pytest.raises(ValueError, match="reserved"):
        BucketAggregate(spark, f"{tmp_root}/bagg_rows",
                        group_by={"rows": "lang"})
    with pytest.raises(ValueError, match="reserved"):
        BucketAggregate(spark, f"{tmp_root}/bagg_bkt",
                        group_by={"__bucket": "lang"})
    # FeedAggregate-shaped metrics (bare expr string) refuse with a
    # shape hint, not a cryptic first-character "unsupported fn"
    with pytest.raises(ValueError, match="expected \\(fn, row_expr\\)"):
        BucketAggregate(spark, f"{tmp_root}/bagg_shape",
                        group_by=GROUPS,
                        metrics={"bytes": "length(content)"})


def test_bucket_aggregate_approx_distinct(spark, tmp_root):
    """The sketch member of the metric family: per-(bucket, group) HLL
    partials unioned at read. At test cardinalities the DataSketches
    HLL is exact (coupon-list regime), so equality with
    count(distinct) is asserted outright — through inserts sharing
    values across buckets, the delete of a value's LAST carrier (as
    non-invertible for DISTINCT as deleting the MIN is for MIN), a
    delete that leaves another carrier alive (count must NOT drop),
    and an all-NULL group (0, matching SQL)."""
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/bagg_hll", table,
                            num_buckets=8)
    metrics = {"langs": ("approx_distinct", "lang"),
               "variants": ("approx_distinct", "content")}
    agg = BucketAggregate(spark, f"{tmp_root}/bagg_hll_state",
                          group_by={"repo": "repo"}, metrics=metrics)

    def direct():
        return {
            r["repo"]: (r["rows"], r["langs"], r["variants"])
            for r in sink.read()
            .groupBy("repo")
            .agg(F.count(F.lit(1)).alias("rows"),
                 F.count_distinct("lang").alias("langs"),
                 F.count_distinct("content").alias("variants"))
            .collect()
        }

    def got():
        return {r["repo"]: (r["rows"], r["langs"], r["variants"])
                for r in agg.read().collect()}

    ins = {"op": OP_ROW_INSERT, "commit": "c0"}
    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": i, "repo": "o/r1", "path": f"p{i}",
         "lang": ["py", "py", "rs", "py", "py", "py"][i],
         "content": f"v{i % 2}"}
        for i in range(6)
    ] + [
        {**ins, "ms": 10, "seq": 6, "repo": "o/r2", "path": "q",
         "lang": "go", "content": None},
    ]), table), {"step": 1})
    agg.sync(sink)
    g = got()
    assert g == direct()
    assert g["o/r1"] == (6, 2, 2)
    assert g["o/r2"] == (1, 1, 0)  # all-NULL content -> 0 distinct

    # delete the ONLY rs row: distinct langs must drop to 1 — the
    # non-invertible case (a sketch cannot subtract; the bucket
    # rebuild can); delete ONE of several py rows: langs must stay
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_DELETE, "ms": 20, "seq": 0, "repo": "o/r1",
         "path": "p2"},   # the only rs
        {"op": OP_ROW_DELETE, "ms": 20, "seq": 1, "repo": "o/r1",
         "path": "p0"},   # one of several py
    ]), table), {"step": 2})
    agg.sync(sink)
    g = got()
    assert g == direct()
    assert g["o/r1"][1] == 1  # rs gone; py survives via other rows

    # a fresh rebuild from empty re-reduces to the identical estimates
    agg2 = BucketAggregate(spark, f"{tmp_root}/bagg_hll2",
                           group_by={"repo": "repo"}, metrics=metrics)
    agg2.sync(sink)
    assert {r["repo"]: (r["rows"], r["langs"], r["variants"])
            for r in agg2.read().collect()} == g


def test_external_minmax_maintainer(spark, tmp_root):
    """The deployment shape: ``tools/index_maintainer.py --kind
    minmax`` in a SEPARATE OS process brings the non-invertible rollup
    to the fixpoint of a replayed multi-window world (exit 0 == quiet
    fixpoint confirmed), and the externally-maintained state equals a
    direct GROUP BY; a follow-up in-process sync is a no-op."""
    import os
    import subprocess
    import sys

    from scylla_cdc_java_spark import (
        Engine, EngineConfig, GenSpec, generate_world, write_world,
    )

    REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = GenSpec(seed=53, n_events=1500, n_repos=20, paths_per_repo=6,
                   n_generations=2, streams_per_generation=4,
                   gen_span_ms=120_000)
    info = write_world(generate_world(spec), f"{tmp_root}/bagg_mm_world")
    target = f"{tmp_root}/bagg_mm_target"
    state_dir = f"{tmp_root}/bagg_mm_rollup"
    eng = Engine(
        spark, info["log_dir"], info["generations_path"], target,
        cfg=EngineConfig(window_length_limit_ms=30_000, sleep_scale=0.01),
    )
    stats = eng.replay()
    assert stats.windows >= 4

    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO_ROOT, "tools", "index_maintainer.py"),
         target, state_dir, "--kind", "minmax", "--interval", "0.1",
         "--until-done", "--max-rounds", "60", "--cores", "2"],
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, (proc.stdout, proc.stderr)

    agg = BucketAggregate(spark, state_dir, group_by=GROUPS,
                          metrics=METRICS)
    s = agg.sync(eng.sink)
    assert s["changed"] == [] and s["removed"] == []
    assert _got(agg) == _direct(eng.sink)


def test_bucket_aggregate_drained_table(spark, tmp_root):
    """Every row deleted: all partials partitions drop; read() serves
    zero rows off the persisted schema instead of raising."""
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/bagg_d", table,
                            num_buckets=4)
    agg = BucketAggregate(spark, f"{tmp_root}/bagg_d_state",
                          group_by=GROUPS, metrics=METRICS)
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_INSERT, "commit": "c0", "ms": 10, "seq": 0,
         "repo": "o/r1", "path": "a.py", "lang": "py", "content": "aa"},
    ]), table), {"step": 1})
    agg.sync(sink)
    assert _got(agg) == {"py": (1, 2, 2, 2)}
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_DELETE, "ms": 20, "seq": 0, "repo": "o/r1",
         "path": "a.py"},
    ]), table), {"step": 2})
    agg.sync(sink)
    assert agg.read().count() == 0
