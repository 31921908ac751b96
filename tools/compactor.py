"""External maintenance process: compact + vacuum a live writer's table.

The reference delegates compaction to the destination Scylla cluster's
own background compaction (the replicator just issues point writes,
Main.java:674-683); a lake sink must provide that service explicitly.
This tool is it: a separate OS process that periodically collapses
multi-segment buckets and reaps superseded files WHILE the engine keeps
appending windows. Safety comes from the sink's serializable commits
(COMMIT.lock critical section + rebase, parquet_merge.py module
docstring) and from ``staging_grace_s`` on vacuum.

Usage:
    python tools/compactor.py TARGET [--interval 30] [--once]
        [--retain-snapshots 0] [--grace 600] [--expire-before-ms N]
        [--policy major|lsm] [--max-rounds N] [--out compactor.jsonl]

Stops when TARGET's manifest checkpoint says done=True (the writer
finished) if --until-done, else loops forever / --max-rounds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daemon_util import wait_for_manifest, writer_done  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("target")
    ap.add_argument("--interval", type=float, default=30.0)
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--until-done", action="store_true")
    # sharded fleets: shards that start late have NO checkpoint entry
    # yet, and the manifest's top-level done only aggregates shards
    # that HAVE checkpointed — without this, the compactor would exit
    # as soon as the first shard(s) finish, leaving the rest of the
    # run unmaintained. done=True is honored only once this many shard
    # entries exist (default 1 keeps single-writer behavior).
    ap.add_argument("--expect-shards", type=int, default=1)
    ap.add_argument("--max-rounds", type=int, default=0)
    # default 1: a concurrent READER process that resolved its plan
    # against the previous version must still find those files (cross-
    # process readers pin via read(version=...) + retained snapshots;
    # in-process leases don't cross process boundaries)
    ap.add_argument("--retain-snapshots", type=int, default=1)
    ap.add_argument("--grace", type=float, default=600.0)
    # this process's lease horizon: bounds how long other processes'
    # read leases are honored when their files are corrupt, AND the
    # snapshot publication grace (snapshots younger than this stay
    # readable on tables with live change-feed cursors)
    ap.add_argument("--reader-lease", type=float, default=None)
    ap.add_argument("--expire-before-ms", type=int, default=None)
    # 'major' (default, historic): collapse EVERY multi-segment bucket
    # to one base per round — right when this daemon is the table's
    # only compaction. 'lsm': sink.maintain() — the same minor/major
    # size-ratio split the writer's piggyback uses, so an externally-
    # maintained table in LSM steady state (base + merged delta) isn't
    # fully rewritten every round.
    ap.add_argument("--policy", choices=["major", "lsm"], default="major")
    # maintenance thresholds are the MAINTAINER's own (a daemon may
    # compact more eagerly than the writer's piggyback would)
    ap.add_argument("--compact-threshold", type=int, default=None)
    ap.add_argument("--minor-ratio", type=float, default=None)
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.policy != "lsm" and (args.compact_threshold is not None
                                 or args.minor_ratio is not None):
        # --policy major calls the rewrite-everything compact(), which
        # never consults these; accepting them silently would let an
        # operator believe they tuned something
        ap.error("--compact-threshold/--minor-ratio require --policy lsm")

    from scylla_cdc_java_spark.session import get_spark
    from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

    # wait for the writer's first commit (manifest appears)
    wait_for_manifest(args.target)

    spark = get_spark(master=f"local[{args.cores}]",
                      shuffle_partitions=args.cores)
    kw = {}
    if args.reader_lease is not None:
        kw["reader_lease_s"] = args.reader_lease
    if args.compact_threshold is not None:
        kw["compact_threshold"] = args.compact_threshold
    if args.minor_ratio is not None:
        kw["minor_compact_ratio"] = args.minor_ratio
    sink = ParquetMergeSink.for_existing(spark, args.target, **kw)
    log = open(args.out, "a") if args.out else None
    rounds = 0
    try:
        while True:
            t0 = time.time()
            if args.policy == "lsm":
                cstats = sink.maintain(
                    expire_before_ms=args.expire_before_ms)
            else:
                cstats = sink.compact(
                    expire_before_ms=args.expire_before_ms)
            removed = sink.vacuum(retain_snapshots=args.retain_snapshots,
                                  staging_grace_s=args.grace)
            rec = {
                "ts": round(time.time(), 2),
                "compacted": cstats["compacted"],
                "compact_s": round(cstats["compact_s"], 2),
                "vacuumed": removed,
                "round_s": round(time.time() - t0, 2),
            }
            if cstats.get("minor_compacted"):
                rec["minor_compacted"] = cstats["minor_compacted"]
                rec["minor_compact_s"] = round(
                    cstats.get("minor_compact_s", 0.0), 2)
            line = json.dumps(rec)
            print(line, flush=True)
            if log:
                log.write(line + "\n")
                log.flush()
            rounds += 1
            if args.once or (args.max_rounds and rounds >= args.max_rounds):
                break
            if args.until_done and writer_done(sink.checkpoint(),
                                               args.expect_shards):
                break
            time.sleep(args.interval)
    finally:
        if log:
            log.close()
        spark.stop()


if __name__ == "__main__":
    main()
