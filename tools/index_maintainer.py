"""External index-maintenance process: keep an incremental datapipe
index in lockstep with a LIVE writer's table.

The reference delegates all derived-state upkeep to the destination
database (the replicator just issues point writes, Main.java:674-683);
this engine's datapipe indexes (MinHash / SimHash / IVF,
datapipe/incremental.py) are maintained the same way the lake sink's
compaction is — by a separate OS process running against the live
writer. Safety needs no coordination with the writer at all: each
``sync()`` reads one atomically-published root manifest, rescans only
the buckets whose write-once manifest entries changed, and data
segments are immutable (compaction replaces manifest POINTERS; files
are only reaped by vacuum, which retains snapshots / honors leases).
A sync racing a commit simply sees either the old or the new root and
the next sync catches whatever it missed — the fingerprint diff makes
catch-up exact, never quadratic.

Usage:
    python tools/index_maintainer.py TARGET INDEX_DIR
        [--kind minhash|simhash|ivf|aggregate|minmax] [--interval 1]
        [--once]
        [--until-done] [--expect-shards 1] [--done-quiet 2]
        [--max-rounds N] [--cores 2] [--text-col content]
        [--out maintainer.jsonl]

With --until-done: exits (status 0) only after ``--done-quiet``
CONSECUTIVE syncs that each started with the writer's checkpoint
already done=True (and >= --expect-shards shard entries) and found no
changed/removed buckets. One quiet sync is not enough: the writer's
last merge commit carries done=True but its piggybacked compaction
lands as a separate LATER commit, so a single post-done quiet sync can
fall in the gap before that trailing commit. Post-done quiet syncs are
cheap (a root read, no Spark job), so the extra confirmation rounds
cost milliseconds plus the sleep interval. Note the index is
VALUE-correct at any post-done quiet exit regardless — compaction
only moves manifest pointers, never row content — the confirmation
rounds are about leaving the fingerprint state at the true fixpoint so
a follow-up sync is a no-op. If --max-rounds exhausts before the
fixpoint is confirmed, the exit status is 3 (stale-possible), so
callers can tell a give-up from a fixpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daemon_util import wait_for_manifest, writer_done  # noqa: E402

KINDS = ("minhash", "simhash", "ivf", "aggregate", "minmax")
EXIT_STALE_POSSIBLE = 3


def _make_index(kind: str, spark, index_dir: str, text_col: str,
                group_col: str):
    if kind == "aggregate":
        # the feed-driven rollup consumer (sinks/aggregate.py): same
        # zero-coordination deployment, but it consumes the CHANGE FEED
        # through a cursor (leased snapshots) instead of rescanning
        # changed buckets — its sync() shares the changed/removed/
        # table_version stats shape, so the loop below is unchanged
        from scylla_cdc_java_spark.sinks.aggregate import FeedAggregate

        return FeedAggregate(
            spark, index_dir,
            group_by={group_col: group_col},
            metrics={"bytes": f"length({text_col})"},
        )
    if kind == "minmax":
        # the snapshot-synced rollup with NON-INVERTIBLE metrics
        # (sinks/aggregate.py::BucketAggregate): maintenance core is
        # the same bucket-synced fingerprint diff as the text indexes,
        # so the loop below is unchanged
        from scylla_cdc_java_spark.sinks.aggregate import BucketAggregate

        return BucketAggregate(
            spark, index_dir,
            group_by={group_col: group_col},
            metrics={"min_bytes": ("min", f"length({text_col})"),
                     "max_bytes": ("max", f"length({text_col})"),
                     "sum_bytes": ("sum", f"length({text_col})")},
        )
    from scylla_cdc_java_spark.datapipe.incremental import (
        IncrementalIVFIndex,
        IncrementalMinHashIndex,
        IncrementalSimHashIndex,
    )

    cls = {"minhash": IncrementalMinHashIndex,
           "simhash": IncrementalSimHashIndex,
           "ivf": IncrementalIVFIndex}[kind]
    return cls(spark, index_dir, text_col=text_col)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("target")
    ap.add_argument("index_dir")
    ap.add_argument("--kind", choices=KINDS, default="minhash")
    ap.add_argument("--interval", type=float, default=1.0)
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--until-done", action="store_true")
    ap.add_argument("--expect-shards", type=int, default=1)
    ap.add_argument("--done-quiet", type=int, default=2)
    ap.add_argument("--max-rounds", type=int, default=0)
    ap.add_argument("--cores", type=int, default=2)
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--group-col", default="lang",
                    help="group column for --kind aggregate")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from scylla_cdc_java_spark.session import get_spark
    from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

    wait_for_manifest(args.target)

    spark = get_spark(master=f"local[{args.cores}]",
                      shuffle_partitions=args.cores)
    sink = ParquetMergeSink.for_existing(spark, args.target)
    idx = _make_index(args.kind, spark, args.index_dir,
                      args.text_col, args.group_col)
    log = open(args.out, "a") if args.out else None
    rounds = 0
    quiet_done_streak = 0
    at_fixpoint = False
    try:
        while True:
            # read done BEFORE the sync: only a sync that STARTED with
            # done=True is guaranteed to have observed every commit
            was_done = writer_done(sink.checkpoint(), args.expect_shards)
            try:
                s = idx.sync(sink)
            except Exception as e:  # noqa: BLE001 — classified below
                from scylla_cdc_java_spark.sinks.changefeed import (
                    _is_transient_read_race,
                )

                if not _is_transient_read_race(e):
                    raise
                # a long sync can outlive its read leases and lose
                # files to a concurrent vacuum mid-job; the sync is
                # idempotent (fingerprint state commits last), so the
                # next round simply redoes it against fresh metadata
                rec = {"ts": round(time.time(), 2),
                       "transient_retry": str(e)[:200]}
                line = json.dumps(rec)
                print(line, flush=True)
                if log:
                    log.write(line + "\n")
                    log.flush()
                rounds += 1
                quiet_done_streak = 0
                if args.once or (args.max_rounds
                                 and rounds >= args.max_rounds):
                    break
                time.sleep(args.interval)
                continue
            quiet = not s["changed"] and not s["removed"]
            quiet_done_streak = quiet_done_streak + 1 \
                if (was_done and quiet) else 0
            rec = {
                "ts": round(time.time(), 2),
                "changed": len(s["changed"]),
                "removed": len(s["removed"]),
                "table_version": s["table_version"],
                "sync_s": round(s["sync_s"], 2),
                "writer_done": was_done,
            }
            line = json.dumps(rec)
            print(line, flush=True)
            if log:
                log.write(line + "\n")
                log.flush()
            rounds += 1
            if quiet_done_streak >= max(args.done_quiet, 1):
                at_fixpoint = True
                if args.until_done:
                    break
            if args.once or (args.max_rounds and rounds >= args.max_rounds):
                break
            time.sleep(args.interval)
    finally:
        if log:
            log.close()
        spark.stop()
    if args.until_done and not at_fixpoint:
        return EXIT_STALE_POSSIBLE
    return 0


if __name__ == "__main__":
    sys.exit(main())
