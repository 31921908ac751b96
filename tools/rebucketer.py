"""External partition-evolution process: rebucket a live writer's table.

The one-shot companion to tools/compactor.py for the other maintenance
commit a growing table needs (ROUND5.md §11): a separate OS process
that waits for the table to exist (optionally for a minimum committed
version, so it can be aimed mid-campaign) and then runs
``sink.rebucket(NEW_NUM_BUCKETS)`` — the atomic full rewrite under the
new ``pmod(xxhash64(pk), n)`` routing. Safety against the live writer
and any concurrent compactor comes entirely from the sink's commit
protocol: rebucket retries past concurrent data commits (exact
read-set match) and concurrent writers fence + re-stage
(``RoutingChangedError`` handled inside ``merge()``); this tool adds
no coordination of its own.

Usage:
    python tools/rebucketer.py TARGET NEW_NUM_BUCKETS
        [--wait-version N] [--max-retries 25] [--cores 4]
        [--out rebucketer.jsonl]

Exit 0 on a landed rebucket; nonzero if retries were exhausted.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daemon_util import wait_for_manifest  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("target")
    ap.add_argument("new_num_buckets", type=int)
    ap.add_argument("--wait-version", type=int, default=0,
                    help="block until the table's committed version "
                         "reaches this (aim the rebucket mid-campaign)")
    ap.add_argument("--max-retries", type=int, default=25)
    ap.add_argument("--cores", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from scylla_cdc_java_spark.session import get_spark
    from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

    wait_for_manifest(args.target)
    spark = get_spark(master=f"local[{args.cores}]",
                      shuffle_partitions=args.cores)
    try:
        sink = ParquetMergeSink.for_existing(spark, args.target)
        while sink._load_root()["version"] < args.wait_version:
            time.sleep(0.2)
        t0 = time.time()
        st = sink.rebucket(args.new_num_buckets,
                           max_retries=args.max_retries)
        rec = {"ts": round(time.time(), 2),
               "wall_s": round(time.time() - t0, 2), **st}
        line = json.dumps(rec)
        print(line, flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(line + "\n")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
