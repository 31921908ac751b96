"""Delete-storm posture of the tombstone sidecars.

Two guards keep the tombstone-apply join safe when a window carries an
extreme number of partition/range deletes (ops 4-8):

1. ``broadcast_tomb_limit``: above this many accumulated sidecar rows
   the partition/range tombstone joins switch from ``F.broadcast`` to a
   plain shuffle join (AQE may still pick broadcast if the aggregated
   side turns out small) — the driver's broadcast memory can never be
   blown by a delete storm. The row count is O(selected buckets)
   root-entry arithmetic (no extra Spark job).
2. ``tomb_rows_compact_threshold``: a bucket whose sidecar row count
   crosses this bound is force-compacted on the spot (tombstones folded
   into the rows and cleared), independent of the segment-count
   threshold.

Reference framing: Scylla itself bounds tombstone accumulation via
compaction (tombstone GC); the reference library replays deletes as
point writes to a live cluster (replicator Main.java:450-531) and
inherits that bound. The lake sink must create it explicitly.
"""

from scylla_cdc_java_spark.model import (
    OP_PARTITION_DELETE,
    OP_RANGE_DELETE_END_INCLUSIVE,
    OP_RANGE_DELETE_START_INCLUSIVE,
    OP_ROW_INSERT,
    TableConfig,
)
from scylla_cdc_java_spark.operators.fold import fold_batch, normalize_log
from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

SID = b"\x0a" * 16
COLS = ["repo", "path", "commit", "lang", "content"]


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


def _world_rows():
    """12 repos x 4 paths inserted, then a delete storm: partition
    deletes over half the repos + a ranged delete in the others."""
    rows = []
    seq = 0
    for ri in range(12):
        for pi in range(4):
            rows.append({"op": OP_ROW_INSERT, "ms": 10, "seq": seq,
                         "repo": f"o/r{ri}", "path": f"p{pi}.py",
                         "content": f"c{ri}_{pi}"})
            seq += 1
    storm = []
    seq = 0
    for ri in range(0, 12, 2):
        storm.append({"op": OP_PARTITION_DELETE, "ms": 20, "seq": seq,
                      "repo": f"o/r{ri}"})
        seq += 1
    for ri in range(1, 12, 2):
        storm.append({"op": OP_RANGE_DELETE_START_INCLUSIVE, "ms": 20,
                      "seq": seq, "repo": f"o/r{ri}", "path": "p1.py"})
        storm.append({"op": OP_RANGE_DELETE_END_INCLUSIVE, "ms": 20,
                      "seq": seq + 1, "repo": f"o/r{ri}", "path": "p2.py"})
        seq += 2
    return rows, storm


EXPECT = sorted(
    (f"o/r{ri}", f"p{pi}.py", f"c{ri}_{pi}")
    for ri in range(1, 12, 2) for pi in (0, 3)
)


def _state(sink):
    return sorted(
        (r["repo"], r["path"], r["content"])
        for r in sink.read().collect()
    )


def test_delete_storm_shuffle_fallback_matches_broadcast(spark, tmp_root):
    """broadcast_tomb_limit=0 forces the shuffle-join path; the visible
    state must be identical to the default broadcast path."""
    table = TableConfig()
    states = {}
    for name, limit in (("bc", 10**9), ("shuffle", 0)):
        sink = ParquetMergeSink(
            spark, f"{tmp_root}/storm_{name}", table, num_buckets=4,
            compact_threshold=1000, broadcast_tomb_limit=limit,
            tomb_rows_compact_threshold=10**9,
        )
        rows, storm = _world_rows()
        sink.merge(fold_batch(_batch(spark, rows), table), {"step": 1})
        sink.merge(fold_batch(_batch(spark, storm), table), {"step": 2})
        # sidecars are live (not yet compacted) -> the tombstone join
        # actually executes on the read path
        assert any(segs for segs in sink.manifest()["tomb_segs"].values())
        states[name] = _state(sink)
    assert states["bc"] == states["shuffle"] == EXPECT


def test_tomb_rows_threshold_forces_compaction(spark, tmp_root):
    """A bucket whose sidecar rows cross tomb_rows_compact_threshold is
    compacted immediately (sidecars folded + cleared), keeping the
    broadcast path bounded without waiting for the segment-count
    threshold."""
    table = TableConfig()
    sink = ParquetMergeSink(
        spark, f"{tmp_root}/storm_force", table, num_buckets=4,
        compact_threshold=1000, tomb_rows_compact_threshold=1,
    )
    rows, storm = _world_rows()
    sink.merge(fold_batch(_batch(spark, rows), table), {"step": 1})
    stats = sink.merge(fold_batch(_batch(spark, storm), table), {"step": 2})
    assert stats.get("compacted_buckets")  # storm triggered compaction
    m = sink.manifest()
    assert not any(segs for segs in m["tomb_segs"].values())  # cleared
    assert _state(sink) == EXPECT
