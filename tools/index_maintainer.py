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
        [--kind minhash|simhash|ivf] [--interval 1] [--once]
        [--until-done] [--expect-shards 1] [--max-rounds N]
        [--cores 2] [--text-col content] [--out maintainer.jsonl]

With --until-done: exits at the FIXPOINT — a sync that both STARTED
with the writer's checkpoint already done=True (and >= --expect-shards
shard entries) and found no changed/removed buckets. done alone is not
enough: the writer's last merge commit carries done=True but its
piggybacked compaction lands as a separate LATER commit, so the first
post-done sync can still observe manifest churn. At the fixpoint the
index's fingerprints equal the final root, so the index left behind
equals a full recompute over the final table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KINDS = ("minhash", "simhash", "ivf")


def _make_index(kind: str, spark, index_dir: str, text_col: str):
    from scylla_cdc_java_spark.datapipe.incremental import (
        IncrementalIVFIndex,
        IncrementalMinHashIndex,
        IncrementalSimHashIndex,
    )

    cls = {"minhash": IncrementalMinHashIndex,
           "simhash": IncrementalSimHashIndex,
           "ivf": IncrementalIVFIndex}[kind]
    return cls(spark, index_dir, text_col=text_col)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("target")
    ap.add_argument("index_dir")
    ap.add_argument("--kind", choices=KINDS, default="minhash")
    ap.add_argument("--interval", type=float, default=1.0)
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--until-done", action="store_true")
    # same late-shard guard as tools/compactor.py: done only aggregates
    # shards that HAVE checkpointed
    ap.add_argument("--expect-shards", type=int, default=1)
    ap.add_argument("--max-rounds", type=int, default=0)
    ap.add_argument("--cores", type=int, default=2)
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from scylla_cdc_java_spark.session import get_spark
    from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

    # wait for the writer's first commit (manifest appears)
    mpath = os.path.join(args.target, "MANIFEST.json")
    while not os.path.exists(mpath):
        time.sleep(0.2)

    spark = get_spark(master=f"local[{args.cores}]",
                      shuffle_partitions=args.cores)
    sink = ParquetMergeSink.for_existing(spark, args.target)
    idx = _make_index(args.kind, spark, args.index_dir, args.text_col)
    log = open(args.out, "a") if args.out else None
    rounds = 0
    try:
        while True:
            # read done BEFORE the sync: if the writer had already
            # finished when this sync started, the sync observes every
            # commit and is the final word
            ckpt = sink.checkpoint() or {}
            n_shards = len(ckpt.get("shards") or {}) if "shards" in ckpt \
                else 1
            was_done = bool(ckpt.get("done")) and \
                n_shards >= args.expect_shards
            s = idx.sync(sink)
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
            if args.once or (args.max_rounds and rounds >= args.max_rounds):
                break
            if args.until_done and was_done and not s["changed"] \
                    and not s["removed"]:
                break
            time.sleep(args.interval)
    finally:
        if log:
            log.close()


if __name__ == "__main__":
    main()
