"""Bloom-filter bucket skipping (sinks/bloom.py): the third read-side
pruning tier — equality predicates on high-cardinality uniform columns
that zone maps cannot bound (random hex spans every bucket's [min,max])
and that don't own the table's one persisted sort order.

What the suite pins:
- EXACT parity between the driver's pure-Python XXH64 probe and the
  JVM's ``xxhash64`` (single and chained-seed forms) on randomized
  strings — the no-false-negative guarantee rests on this;
- scan(bloom) == scan(prune=False) in every state (dirty deltas,
  compacted, mixed bloomed/unbloomed segments, schema evolution);
- blooms actually prune where zone maps keep everything;
- config is table state: inherited by ``for_existing`` maintainers,
  stripped by an explicit ``bloom_columns=[]``.
"""

import random

from pyspark.sql import functions as F

from scylla_cdc_java_spark.model import (
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
    TableConfig,
)
from scylla_cdc_java_spark.operators.fold import fold_batch, normalize_log
from scylla_cdc_java_spark.sinks import bloom as B
from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

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


def _sha(i: int) -> str:
    """Deterministic 40-hex 'commit sha' — uniform, high-cardinality:
    the value class zone maps provably cannot prune."""
    rng = random.Random(1000 + i)
    return "".join(rng.choice("0123456789abcdef") for _ in range(40))


def _insert_world(spark, sink, n=64, start_ms=10):
    rows = [
        {"op": OP_ROW_INSERT, "ms": start_ms, "seq": i,
         "repo": f"org/r{i:03d}", "path": "main.x", "commit": _sha(i),
         "lang": "py", "content": f"body-{i:03d}"}
        for i in range(n)
    ]
    sink.merge(fold_batch(_batch(spark, rows), sink.table),
               {"step": start_ms})


def _rows(df):
    return sorted(tuple(r[c] for c in df.columns) for r in df.collect())


def _assert_equal_and_info(sink, filters):
    info = {}
    got = _rows(sink.scan(filters, info=info))
    want = _rows(sink.scan(filters, prune=False))
    assert got == want
    return got, info


# ---------------------------------------------------------------- hash
def test_xxh64_parity_with_spark(spark):
    """The driver probe MUST hash exactly like the JVM builder: pin
    xxh64 (single + chained seed) and the full position pipeline
    against Spark's own expressions on randomized strings."""
    rng = random.Random(99)
    vals = ["", "a", "0123456789abcdef" * 5] + [
        "".join(rng.choice("abcdefghij0123456789/._-")
                for _ in range(rng.randint(1, 90)))
        for _ in range(60)
    ]
    m, k = 4096, 6
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = df.select(
        "s",
        F.array(*B.position_exprs(F.col("s"), m, k)).alias("pos"),
    ).collect()
    for r in got:
        assert list(r["pos"]) == B.probe_positions(r["s"], m, k), r["s"]


def test_bitmap_encode_probe_roundtrip():
    """encode_bitmap packs bit_or words exactly as may_contain reads
    them: every inserted value probes positive; a value whose k
    positions aren't all set probes negative."""
    m, k = 4096, 6
    words: dict[int, int] = {}
    present = [f"v{i}" for i in range(50)]
    for v in present:
        for p in B.probe_positions(v, m, k):
            words[p >> 6] = words.get(p >> 6, 0) | (1 << (p & 63))
    spec = B.encode_bitmap(
        # emulate Java signed longs coming back from bit_or
        {w: (x - (1 << 64) if x >= 1 << 63 else x)
         for w, x in words.items()}, m, k)
    assert all(B.may_contain(spec, v) for v in present)
    absent_hits = sum(
        B.may_contain(spec, f"absent{i}") for i in range(500))
    assert absent_hits < 50  # FPR ~ (1-e^-kn/m)^k, far below 10%
    # degradation: malformed specs never exclude
    assert B.may_contain({"m": m, "k": k, "z": "!!notb64!!"}, "x")
    assert B.may_contain(None, "x")


# ---------------------------------------------------------------- scan
def test_bloom_prunes_where_zone_maps_cannot(spark, tmp_root):
    """Uniform 40-hex commits across 16 buckets, ~16 per bucket: each
    bucket's [min,max] covers most of the hex space, so zone maps keep
    the majority of buckets; blooms prune to the true bucket — and the
    result equals the unpruned scan."""
    tbl = TableConfig()
    zs = ParquetMergeSink(spark, f"{tmp_root}/bloom_zs", tbl,
                          num_buckets=16, compact_threshold=99)
    bs = ParquetMergeSink(spark, f"{tmp_root}/bloom_bs", tbl,
                          num_buckets=16, compact_threshold=99,
                          bloom_columns=["commit"])
    _insert_world(spark, zs, n=256)
    _insert_world(spark, bs, n=256)
    # a MID-RANGE sha (starts '7'): inside most buckets' [min, max] —
    # an extreme-quantile target would let zone maps prune by luck
    target = _sha(10)
    filters = [("commit", "=", target)]

    _, zinfo = _assert_equal_and_info(zs, filters)
    got, binfo = _assert_equal_and_info(bs, filters)
    assert got and got[0][2] == target  # (repo, path, commit, ...)
    # zone maps degrade toward useless as values-per-bucket grow
    # (E[kept] = (n-1)/(n+1) per bucket); blooms stay surgical
    assert zinfo["kept_buckets"] >= 8
    assert binfo["kept_buckets"] <= 3  # 1 true bucket + ~2% FPR slack

    # dirty -> compacted: fresh bases rebuild blooms from resolved rows
    bs.compact(buckets=list(range(16)))
    got2, cinfo = _assert_equal_and_info(bs, filters)
    assert got2 == got and cinfo["kept_buckets"] <= 3

    # 'in' over two shas from different buckets
    got3, iinfo = _assert_equal_and_info(
        bs, [("commit", "in", (_sha(3), _sha(40)))])
    assert len(got3) == 2 and iinfo["kept_buckets"] <= 4


def test_bloom_conservative_on_unbloomed_segments(spark, tmp_root):
    """Segments written BEFORE blooms were enabled make their buckets
    unprunable (never wrong); enabling later still prunes buckets all
    of whose segments carry blooms, and a full compact restores full
    pruning."""
    tbl = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/bloom_late", tbl,
                            num_buckets=16, compact_threshold=99)
    _insert_world(spark, sink, n=32, start_ms=10)  # no blooms yet
    sink.bloom_columns = ["commit"]
    _insert_world(spark, sink, n=8, start_ms=20)  # bloomed deltas

    target = _sha(17)
    got, info = _assert_equal_and_info(sink, [("commit", "=", target)])
    assert got and got[0][2] == target
    # every bucket holding an unbloomed segment stays kept
    assert info["kept_buckets"] >= 1

    sink.compact(buckets=list(range(16)))
    got2, cinfo = _assert_equal_and_info(sink, [("commit", "=", target)])
    assert got2 == got
    assert cinfo["kept_buckets"] <= 3  # fully bloomed after compact


def test_bloom_respects_updates_not_stale_versions(spark, tmp_root):
    """A row whose commit moved a->b in a later delta: scanning for a
    must NOT resurrect the stale version (old segment's bloom contains
    a, so the bucket is kept — resolution still wins), and scanning
    for b finds the row."""
    tbl = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/bloom_upd", tbl,
                            num_buckets=8, compact_threshold=99,
                            bloom_columns=["commit"])
    _insert_world(spark, sink, n=16, start_ms=10)
    upd = [{"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "org/r005",
            "path": "main.x", "commit": "f" * 40}]
    sink.merge(fold_batch(_batch(spark, upd), tbl), {"step": 20})

    got_old, _ = _assert_equal_and_info(sink, [("commit", "=", _sha(5))])
    assert got_old == []  # stale version not resurrected
    got_new, _ = _assert_equal_and_info(sink, [("commit", "=", "f" * 40)])
    assert [g[0] for g in got_new] == ["org/r005"]


def test_bloom_config_is_table_state(spark, tmp_root):
    """The writer's bloom config persists in the root; a maintainer
    opened with for_existing (bloom_columns=None) inherits it — its
    compacted bases carry fresh blooms; an explicit [] strips it."""
    path = f"{tmp_root}/bloom_cfg"
    tbl = TableConfig()
    w = ParquetMergeSink(spark, path, tbl, num_buckets=8,
                         compact_threshold=99, bloom_columns=["commit"])
    _insert_world(spark, w, n=32)
    assert w._load_root()["bloom"]["columns"] == ["commit"]

    maint = ParquetMergeSink.for_existing(spark, path, compact_threshold=99)
    assert maint.bloom_columns is None  # not explicit: inherits
    maint.compact(buckets=list(range(8)))
    got, info = _assert_equal_and_info(maint, [("commit", "=", _sha(9))])
    assert got and info["kept_buckets"] <= 2  # inherited capture worked

    off = ParquetMergeSink.for_existing(spark, path, compact_threshold=99)
    off.bloom_columns = []
    _insert_world(spark, off, n=4, start_ms=30)
    assert "bloom" not in off._load_root()  # explicit disable strips


def test_bloom_schema_evolution_added_column(spark, tmp_root):
    """A bloom column that appears via schema evolution: pre-evolution
    segments prune through the zone-map __schema__ leaf list (column
    provably all-null there); post-evolution segments prune through
    their blooms; results stay exact."""
    tbl = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/bloom_evo", tbl,
                            num_buckets=8, compact_threshold=99,
                            bloom_columns=["build_id"])
    _insert_world(spark, sink, n=24)  # no build_id column yet
    evo = [
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": i, "repo": f"org/r{i:03d}",
         "path": "main.x", "build_id": f"bld-{_sha(100 + i)[:12]}"}
        for i in range(4)
    ]
    cols = COLS + ["build_id"]
    sink.merge(fold_batch(_batch(spark, evo, cols=cols), tbl), {"step": 20})

    target = f"bld-{_sha(102)[:12]}"
    got, info = _assert_equal_and_info(sink, [("build_id", "=", target)])
    assert [g[0] for g in got] == ["org/r002"]
    # prunable: pre-evolution segments via __schema__, others via bloom
    assert info["kept_buckets"] <= 2
