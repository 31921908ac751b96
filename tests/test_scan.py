"""Zone-map data skipping: ``sink.scan(filters)`` prunes whole buckets
whose per-segment parquet-footer min/max stats prove no row can match,
and is exactly equal to the unpruned filtered read in every state —
dirty (uncompacted deltas), compacted, schema-evolved, rebucketed,
long-value truncated bounds, and stats-less legacy metadata.

Safety note the suite pins: pruning is valid on UNCOMPACTED buckets
because cell resolution is per-column LWW — every resolved non-null
cell value equals some segment's stored value, so a bucket none of
whose segments can hold a matching value cannot produce a matching
resolved row (and tombstones only remove rows; TTL only nulls values).
"""

from pyspark.sql import functions as F

from scylla_cdc_java_spark.model import (
    OP_ROW_DELETE,
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
    TableConfig,
)
from scylla_cdc_java_spark.operators.fold import fold_batch, normalize_log
from scylla_cdc_java_spark.sinks.parquet_merge import (
    ParquetMergeSink,
    _seg_zone_stats,
    _zone_upper,
)

SID = b"\x0e" * 16
COLS = ["repo", "path", "commit", "lang", "content"]


def _batch(spark, rows, cols=None):
    cols = cols or COLS
    data = [
        (SID, {"ms": r["ms"], "seq": r["seq"]}, r["op"],
         *[r.get(c) for c in cols])
        for r in rows
    ]
    ddl = (
        "`cdc$stream_id` binary, `cdc$time` struct<ms:long,seq:long>, "
        "`cdc$operation` tinyint, "
        + ", ".join(f"`{c}` string" for c in cols)
    )
    return normalize_log(spark.createDataFrame(data, schema=ddl))


def _explain(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )


def _rows(df):
    return sorted(
        tuple(r[c] for c in df.columns) for r in df.collect()
    )


def _assert_scan_equal(sink, filters, expr, info=None):
    got = _rows(sink.scan(filters, info=info))
    want = _rows(sink.read().where(expr))
    assert got == want
    return got


LANGS = ["ada", "c", "go", "java", "lua", "py", "rs", "zig"]


def _world(spark, sink, n=48):
    ins = {"op": OP_ROW_INSERT, "path": "main.x"}
    b1 = [
        {**ins, "ms": 10, "seq": i, "repo": f"org/r{i:03d}",
         "commit": f"c{i}", "lang": LANGS[i % len(LANGS)],
         "content": f"body-{i:03d}"}
        for i in range(n)
    ]
    sink.merge(fold_batch(_batch(spark, b1), sink.table), {"step": 1})
    # second window: updates + a delete (bucket state now dirty)
    b2 = [
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "org/r001",
         "path": "main.x", "lang": "java"},  # py -> java
        {**ins, "ms": 20, "seq": 1, "repo": "org/r900", "commit": "c900",
         "lang": "zig", "content": "body-900"},
        {"op": OP_ROW_DELETE, "ms": 20, "seq": 2, "repo": "org/r002",
         "path": "main.x"},
    ]
    sink.merge(fold_batch(_batch(spark, b2), sink.table), {"step": 2})


def test_scan_equals_filtered_read_dirty_then_compacted(spark, tmp_root):
    sink = ParquetMergeSink(spark, f"{tmp_root}/scan_t1", TableConfig(),
                            num_buckets=16, compact_threshold=99)
    _world(spark, sink)

    cases = [
        ([("lang", "=", "zig")], F.col("lang") == "zig"),
        ([("lang", "in", ["ada", "zig"])], F.col("lang").isin("ada", "zig")),
        ([("lang", ">", "rs")], F.col("lang") > "rs"),
        ([("lang", "<=", "c")], F.col("lang") <= "c"),
        ([("content", "between", ("body-010", "body-019"))],
         (F.col("content") >= "body-010") & (F.col("content") <= "body-019")),
        ([("repo", ">=", "org/r9"), ("lang", "=", "zig")],
         (F.col("repo") >= "org/r9") & (F.col("lang") == "zig")),
    ]
    for filters, expr in cases:  # dirty: deltas, no compaction yet
        _assert_scan_equal(sink, filters, expr)

    # FULL compaction (default compact() skips single-delta buckets,
    # which then aren't base/ segments): every bucket one pk-sorted
    # base -> raw-scan fast path -> residual filter pushdown
    sink.compact(buckets=list(range(16)))
    info = {}
    got = _assert_scan_equal(sink, cases[0][0], cases[0][1], info=info)
    assert got, "selective scan should still find the zig rows"
    # post-compact each bucket holds ONE base with tight stats: a
    # single-lang filter must actually skip buckets
    assert info["pruned_buckets"] > 0
    assert info["kept_buckets"] + info["pruned_buckets"] == \
        info["total_buckets"]
    for filters, expr in cases[1:]:
        _assert_scan_equal(sink, filters, expr)

    # the residual predicate reaches the parquet scan on compacted bases
    plan = _explain(sink.scan([("lang", "=", "zig")]))
    assert "PushedFilters" in plan and "lang" in plan


def test_scan_never_returns_stale_versions(spark, tmp_root):
    """org/r001 was py then updated to java in a later (uncompacted)
    delta: a lang='py' scan must not resurrect the stale py version —
    the bucket is unprunable (some segment holds 'py') but resolution
    still wins."""
    sink = ParquetMergeSink(spark, f"{tmp_root}/scan_t2", TableConfig(),
                            num_buckets=8, compact_threshold=99)
    _world(spark, sink)
    got = sink.scan([("lang", "=", "py")]).select("repo").collect()
    repos = {r["repo"] for r in got}
    assert "org/r001" not in repos  # updated away from py
    assert "org/r002" not in repos  # deleted
    want = {r["repo"] for r in
            sink.read().where(F.col("lang") == "py").collect()}
    assert repos == want


def test_scan_schema_evolution_prunes_pre_evolution_segments(spark,
                                                             tmp_root):
    """A column added later is provably all-null in segments written
    before it existed (the column is absent from their parquet schema):
    buckets touched only before the evolution prune away on a filter
    over the new column."""
    sink = ParquetMergeSink(spark, f"{tmp_root}/scan_t3", TableConfig(),
                            num_buckets=16, compact_threshold=99)
    ins = {"op": OP_ROW_INSERT, "path": "m.x", "commit": "c",
           "content": "x"}
    b1 = [{**ins, "ms": 10, "seq": i, "repo": f"a/r{i}", "lang": "py"}
          for i in range(32)]
    sink.merge(fold_batch(_batch(spark, b1), sink.table), {"step": 1})
    b2 = [{**ins, "ms": 20, "seq": 0, "repo": "a/r0", "lang": "py",
           "stars": "5"}]
    sink.merge(
        fold_batch(_batch(spark, b2, cols=COLS + ["stars"]), sink.table),
        {"step": 2})

    info = {}
    got = _rows(sink.scan([("stars", "=", "5")], info=info))
    assert [g[:2] for g in got] == [("a/r0", "m.x")]
    # every bucket except a/r0's holds only pre-evolution segments
    assert info["pruned_buckets"] == info["total_buckets"] - 1
    # and the unpruned control agrees
    want = _rows(sink.read().where(F.col("stars") == "5"))
    assert got == want


def test_scan_long_values_truncated_bounds(spark, tmp_root):
    """Stored bounds are capped at ZONE_TRUNC chars (min truncated
    down, max truncated-and-incremented up) — correctness on multi-KB
    document values, manifests stay small."""
    sink = ParquetMergeSink(spark, f"{tmp_root}/scan_t4", TableConfig(),
                            num_buckets=4, compact_threshold=99)
    ins = {"op": OP_ROW_INSERT, "path": "d.txt", "commit": "c",
           "lang": "txt"}
    rows = [
        {**ins, "ms": 10, "seq": i, "repo": f"b/r{i}",
         "content": ("doc-%03d-" % i) + "z" * 500}
        for i in range(8)
    ]
    sink.merge(fold_batch(_batch(spark, rows), sink.table), {"step": 1})
    sink.compact()
    lo = "doc-003-"
    hi = "doc-005-" + "z" * 600
    got = _rows(sink.scan([("content", "between", (lo, hi))]))
    want = _rows(sink.read().where(
        (F.col("content") >= lo) & (F.col("content") <= hi)))
    assert got == want and len(got) == 3
    # stored stats really are truncated
    root = sink._load_root()
    for _, e in root["bucket_index"].items():
        st = sink._bucket_state(e)
        for seg_stats in (st.get("stats") or {}).values():
            for col, b2 in seg_stats.items():
                if col == "__schema__":
                    continue
                for bound in b2:
                    assert bound is None or len(bound) <= 65


def test_zone_upper_bound_monotone():
    long = "a" * 80
    up = _zone_upper(long)
    assert up is not None and len(up) <= 64 and up > long
    assert _zone_upper("short") == "short"
    # surrogate-range bump lands on a JSON-encodable code point
    tricky = "x" * 63 + "퟿"
    up2 = _zone_upper(tricky + "tail")
    assert up2 is not None and up2 > tricky + "tail"
    assert not any(0xD800 <= ord(ch) <= 0xDFFF for ch in up2)


def test_scan_validation_is_loud(spark, tmp_root):
    import pytest

    sink = ParquetMergeSink(spark, f"{tmp_root}/scan_t5",
                            TableConfig(collection_columns=("tags",)),
                            num_buckets=4)
    ins = {"op": OP_ROW_INSERT, "path": "p", "commit": "c", "lang": "l",
           "content": "x", "ms": 10, "seq": 0, "repo": "r/r"}
    sink.merge(fold_batch(_batch(spark, [ins]), sink.table), {"step": 1})
    with pytest.raises(ValueError, match="unknown scan column"):
        sink.scan([("nope", "=", "x")]).collect()
    with pytest.raises(ValueError, match="collection column"):
        sink.scan([("tags", "=", "x")]).collect()
    with pytest.raises(TypeError, match="must be str"):
        sink.scan([("lang", "=", 5)]).collect()
    with pytest.raises(ValueError, match="unsupported scan op"):
        sink.scan([("lang", "!=", "x")]).collect()
    with pytest.raises(TypeError):
        sink.scan([("lang", "in", [])]).collect()


def test_scan_after_rebucket(spark, tmp_root):
    sink = ParquetMergeSink(spark, f"{tmp_root}/scan_t6", TableConfig(),
                            num_buckets=4, compact_threshold=99)
    _world(spark, sink, n=32)
    sink.rebucket(16)
    info = {}
    got = _assert_scan_equal(sink, [("lang", "=", "zig")],
                             F.col("lang") == "zig", info=info)
    assert got and info["pruned_buckets"] > 0  # fresh bases carry stats


def test_scan_without_stats_is_correct_not_pruned(spark, tmp_root,
                                                  monkeypatch):
    """Legacy metadata / capture failure: segments without stats are
    never pruned and results stay exact."""
    import scylla_cdc_java_spark.sinks.parquet_merge as pm

    monkeypatch.setattr(pm, "_seg_zone_stats", lambda d, cols: {})
    sink = ParquetMergeSink(spark, f"{tmp_root}/scan_t7", TableConfig(),
                            num_buckets=8, compact_threshold=99)
    _world(spark, sink, n=24)
    sink.compact()
    monkeypatch.undo()
    info = {}
    _assert_scan_equal(sink, [("lang", "=", "zig")],
                       F.col("lang") == "zig", info=info)
    assert info["pruned_buckets"] == 0


def test_seg_zone_stats_all_null_and_missing_column(spark, tmp_root):
    df = spark.createDataFrame(
        [("a", None), ("b", None)], schema="`k` string, `v` string")
    d = f"{tmp_root}/zs_parquet"
    df.coalesce(1).write.mode("overwrite").parquet(d)
    st = _seg_zone_stats(d, ["k", "v", "absent"])
    assert st["k"] == ["a", "b"]
    assert st["v"] == [None, None]       # present, provably all-null
    assert st["absent"] == [None, None]  # absent from the file schema
    assert st["__schema__"] == ["k", "v"]


def test_projection_pushdown_on_compacted_bases(spark, tmp_root):
    """Column pruning must reach the parquet scan on the raw-scan fast
    path: a 2-column projection over a compacted table reads ONLY
    those columns (+ the stored _live flag). On UNCOMPACTED buckets the
    full-width read is semantically required — row liveness is marker
    OR any live cell (Scylla's rule), undecidable without every cell —
    which is exactly why compaction (incl. the round-5 minor policy
    keeping the dirty set to one merged delta) is the steady state."""
    sink = ParquetMergeSink(spark, f"{tmp_root}/scan_proj", TableConfig(),
                            num_buckets=8, compact_threshold=99)
    _world(spark, sink)
    dirty = _explain(sink.read().select("repo", "lang"))
    assert "content:string" in dirty  # liveness needs every cell

    sink.compact(buckets=list(range(8)))
    plan = _explain(sink.read().select("repo", "lang"))
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert reads and all("content" not in ln for ln in reads)
    assert any("repo:string,lang:string,_live:boolean" in ln
               for ln in reads)
