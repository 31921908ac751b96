"""Sort-order evolution (``compact(sort_by=...)``): cluster bases by a
hot filter column so parquet row-group min/max ranges become tight and
scan()'s pushed residual filter skips row groups INSIDE each bucket —
the complement to bucket-level zone maps, which cannot prune a dense
column that hash bucketing decorrelates from the partition key.

Proof here is physical, not just behavioral: tests shrink the parquet
row-group size (``parquet_block_bytes``) so small-scale bases hold many
row groups, then read the footers back and assert the sorted bases'
per-group ranges are non-overlapping while the default pk-sort's
overlap."""

import glob
import os

from pyspark.sql import functions as F

from scylla_cdc_java_spark.model import OP_ROW_INSERT, TableConfig
from scylla_cdc_java_spark.operators.fold import fold_batch, normalize_log
from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

SID = b"\x0f" * 16
COLS = ["repo", "path", "commit", "lang", "content"]
LANGS = ["ada", "c", "go", "java", "lua", "py", "rs", "zig"]


def _batch(spark, rows):
    data = [
        (SID, {"ms": r["ms"], "seq": r["seq"]}, r["op"],
         *[r.get(c) for c in COLS])
        for r in rows
    ]
    ddl = (
        "`cdc$stream_id` binary, `cdc$time` struct<ms:long,seq:long>, "
        "`cdc$operation` tinyint, "
        + ", ".join(f"`{c}` string" for c in COLS)
    )
    return normalize_log(spark.createDataFrame(data, schema=ddl))


def _rows(n, ms=10, start=0):
    return [
        {"op": OP_ROW_INSERT, "ms": ms, "seq": i, "path": "m.x",
         "repo": f"org/r{start + i:05d}", "commit": f"c{i}",
         "lang": LANGS[i % len(LANGS)], "content": "x" * 120 + f"#{i}"}
        for i in range(n)
    ]


def _rg_ranges(sink, col):
    """[(path, [(min, max), ...in row-group order]), ...] for every
    base file of the current snapshot."""
    import pyarrow.parquet as pq

    root = sink._load_root()
    out = []
    for b, e in root["bucket_index"].items():
        st = sink._bucket_state(e)
        for seg in st["segs"]:
            for f in glob.glob(os.path.join(
                    glob.escape(os.path.join(sink.path, seg)),
                    "*.parquet")):
                md = pq.ParquetFile(f).metadata
                idx = next(
                    i for i in range(md.num_columns)
                    if md.schema.column(i).path == col)
                rngs = []
                for rg in range(md.num_row_groups):
                    s = md.row_group(rg).column(idx).statistics
                    rngs.append((s.min, s.max))
                out.append((f, rngs))
    return out


def _overlap_count(files):
    n = 0
    for _, rngs in files:
        for (lo1, hi1), (lo2, hi2) in zip(rngs, rngs[1:]):
            if hi1 > lo2:  # consecutive groups overlap
                n += 1
    return n


def _mk(spark, tmp_root, name):
    sink = ParquetMergeSink(
        spark, f"{tmp_root}/{name}", TableConfig(), num_buckets=2,
        compact_threshold=99, parquet_block_bytes=4096,
    )
    sink.merge(fold_batch(_batch(spark, _rows(1500)), sink.table),
               {"step": 1})
    return sink


def test_sorted_bases_have_disjoint_row_group_ranges(spark, tmp_root):
    sink = _mk(spark, tmp_root, "so1")
    sink.compact(buckets=[0, 1])  # default: pk sort, lang decorrelated
    default_files = _rg_ranges(sink, "lang")
    assert all(len(r) > 1 for _, r in default_files), \
        "parquet_block_bytes must yield multi-row-group bases"
    assert _overlap_count(default_files) > 0  # pk order mixes langs

    sink.compact(buckets=[0, 1], sort_by=["lang"])
    sorted_files = _rg_ranges(sink, "lang")
    assert all(len(r) > 1 for _, r in sorted_files)
    assert _overlap_count(sorted_files) == 0  # tight disjoint ranges
    # scan results unchanged by the physical re-clustering
    got = sorted(r["repo"] for r in
                 sink.scan([("lang", "=", "zig")]).collect())
    want = sorted(r["repo"] for r in
                  sink.read().where(F.col("lang") == "zig").collect())
    assert got == want and got


def test_sort_order_persists_across_merge_and_inherits(spark, tmp_root):
    sink = _mk(spark, tmp_root, "so2")
    sink.compact(buckets=[0, 1], sort_by=["lang"])
    assert sink._load_root()["sort_order"] == ["lang"]
    # a merge must not reset the persisted order (explicit root build)
    sink.merge(fold_batch(_batch(spark, _rows(300, ms=20, start=9000)),
                          sink.table), {"step": 2})
    assert sink._load_root()["sort_order"] == ["lang"]
    # plain compact() inherits the order
    sink.compact(buckets=[0, 1])
    assert _overlap_count(_rg_ranges(sink, "lang")) == 0
    # explicit [] resets to the pk default
    sink.compact(buckets=[0, 1], sort_by=[])
    assert sink._load_root()["sort_order"] == []
    assert _overlap_count(_rg_ranges(sink, "repo")) == 0  # pk-sorted


def test_rebucket_inherits_sort_order(spark, tmp_root):
    sink = _mk(spark, tmp_root, "so3")
    sink.compact(buckets=[0, 1], sort_by=["lang"])
    before = sorted(tuple(r) for r in sink.read().collect())
    sink.rebucket(4)
    assert sorted(tuple(r) for r in sink.read().collect()) == before
    assert _overlap_count(_rg_ranges(sink, "lang")) == 0


def test_sort_order_lookup_still_exact(spark, tmp_root):
    sink = _mk(spark, tmp_root, "so4")
    sink.compact(buckets=[0, 1], sort_by=["lang"])
    row = sink.lookup("org/r00007").collect()
    assert len(row) == 1 and row[0]["lang"] == LANGS[7]


def test_sort_order_validation(spark, tmp_root):
    import pytest

    sink = _mk(spark, tmp_root, "so5")
    with pytest.raises(ValueError, match="not in pk/value columns"):
        sink.compact(buckets=[0, 1], sort_by=["nope"])
