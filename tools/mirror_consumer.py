"""External change-feed consumer: maintain a downstream MIRROR table
from a LIVE writer's change feed, in a separate OS process.

The full round-trip the engine now supports: CDC in (replay →
merge sink) and CDC out (snapshot change feed) → downstream
materialization — the deployment shape of every derived table a
training-data pipeline hangs off the ingest table. Zero coordination
with the writer: each sync polls one atomically-published root,
diffs two committed snapshots (fingerprint-pruned), rewrites only the
mirror partitions of changed buckets, and commits its cursor LAST —
a crash anywhere re-delivers; same-span redelivery converges via the
idempotent net-diff apply, and a crash inside the write→commit window
is recovered exactly via the staged-bucket sidecar (those buckets are
rebuilt from the target snapshot, not diffed over — see
sinks/changefeed.ParquetMirror's crash-recovery notes).

Usage:
    python tools/mirror_consumer.py TARGET MIRROR_DIR
        [--interval 1] [--once] [--until-done] [--expect-shards 1]
        [--done-quiet 2] [--max-rounds N] [--cores 2]
        [--out consumer.jsonl]

Exit semantics mirror tools/index_maintainer.py: with --until-done,
status 0 only after --done-quiet CONSECUTIVE syncs that started with
the writer's checkpoint done=True and found nothing to apply (the
writer's piggybacked compaction lands as a separate commit after the
done-carrying merge; a value-neutral span is detected from the empty
feed, skips the partition rewrite entirely, and just advances the
cursor). --max-rounds exhaustion exits 3 so a give-up is
distinguishable from a fixpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daemon_util import wait_for_manifest, writer_done  # noqa: E402

EXIT_STALE_POSSIBLE = 3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("target")
    ap.add_argument("mirror_dir")
    ap.add_argument("--interval", type=float, default=1.0)
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--until-done", action="store_true")
    ap.add_argument("--expect-shards", type=int, default=1)
    ap.add_argument("--done-quiet", type=int, default=2)
    ap.add_argument("--max-rounds", type=int, default=0)
    ap.add_argument("--cores", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from scylla_cdc_java_spark.session import get_spark
    from scylla_cdc_java_spark.sinks.changefeed import ParquetMirror
    from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

    wait_for_manifest(args.target)

    spark = get_spark(master=f"local[{args.cores}]",
                      shuffle_partitions=args.cores)
    sink = ParquetMergeSink.for_existing(spark, args.target)
    mirror = ParquetMirror(spark, args.mirror_dir)
    log = open(args.out, "a") if args.out else None
    rounds = 0
    quiet_done_streak = 0
    at_fixpoint = False
    try:
        while True:
            was_done = writer_done(sink.checkpoint(), args.expect_shards)
            s = mirror.sync(sink)
            quiet = not s["changed"] and not s["removed"]
            quiet_done_streak = quiet_done_streak + 1 \
                if (was_done and quiet) else 0
            rec = {
                "ts": round(time.time(), 2),
                "applied_rows": s["applied_rows"],
                "changed": len(s["changed"]),
                "removed": len(s["removed"]),
                "cursor_version": s["version"],
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
