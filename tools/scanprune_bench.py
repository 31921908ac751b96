"""Zone-map scan cost probe: pruned vs full filtered read (round 5).

tests/test_scan.py and the `scan_pruned` contract entry prove the
VALUES; this probe measures what bucket-level zone maps BUY — and,
just as deliberately, where they don't:

1. backfill the cached 30M-event bench world (256 buckets, fully
   compacted so every bucket carries base stats);
2. **sparse / late-added column** (the honest win): one tail window
   adds a `flag` column to a handful of repos. `scan(flag = ...)`
   prunes every bucket whose segments provably hold no non-null flag
   (pre-evolution bases record their file schema; the new column is
   absent) — O(touched buckets) IO vs the full-table control
   (`prune=False`), row-for-row equality asserted. This is the query
   shape zone maps exist for on a hash-bucketed table: predicates on
   sparse attributes, late schema additions, or pk-correlated values.
3. **dense decorrelated column** (the honest non-win, reported, not
   hidden): `scan(lang = 'py')` on a hash-bucketed table prunes ~0
   buckets — every bucket contains every lang — so the cost equals the
   full filtered read and the benefit is only the parquet-native
   pushdown. Hash bucketing decorrelates values from buckets BY
   DESIGN; row-level skipping for such predicates belongs to the
   row-group stats inside each file, not to bucket zone maps.

The sparse ratio grows with table size (control is O(table), pruned
scan is O(matching buckets) + fixed job overhead) — the same
divergence CHANGEFEED_r5.json shows for the feed's fingerprint prune.

Usage: python tools/scanprune_bench.py [out.json] [--smoke]
Env: SPARK_GRAFT_BENCH_CACHE (world cache, default /tmp/spark_graft_bench),
     SPARK_GRAFT_CPUS (default 16).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = min(int(os.environ.get("SPARK_GRAFT_CPUS", "16")), 16)
CACHE = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/spark_graft_bench")
NUM_BUCKETS = 256
TAIL_REPOS = 4


def _steal_s() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / os.sysconf("SC_CLK_TCK")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = args[0] if args else os.path.join(REPO, "SCANPRUNE_r5.json")

    from pyspark.sql import functions as F

    from scylla_cdc_java_spark import Engine, GenSpec, generate_world, write_world
    from scylla_cdc_java_spark.model import EngineConfig
    from scylla_cdc_java_spark.operators.fold import fold_batch, normalize_log
    from scylla_cdc_java_spark.session import get_spark

    from bench import _spec, world_for

    n_events = 200_000 if "--smoke" in sys.argv else 30_000_000
    spec = _spec(n_events)
    info = world_for(spec, CACHE)
    spark = get_spark(app="scanprune-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)

    work = tempfile.mkdtemp(prefix="scan_bench_")
    target = os.path.join(work, "target")
    report: dict = {
        "metric": "filtered scan seconds: zone-map pruned vs full read",
        "world_events": info["n_rows"],
        "num_buckets": NUM_BUCKETS,
        "cores": CPUS,
    }
    try:
        # ---- 1. backfill + full compaction ------------------------------
        eng = Engine(
            spark, info["log_dir"], info["generations_path"], target,
            cfg=EngineConfig(window_length_limit_ms=600_000,
                             num_buckets=NUM_BUCKETS,
                             shuffle_partitions=CPUS),
        )
        t0, s0 = time.time(), _steal_s()
        eng.replay(collect_group_metrics=False)
        report["backfill_replay_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        eng.sink.compact(buckets=list(range(NUM_BUCKETS)))
        report["full_compact_s"] = round(time.time() - t0, 2)
        report["table_rows"] = eng.sink.read().count()

        # ---- 2. tail window adds a SPARSE column to a few repos ---------
        tw = generate_world(GenSpec(
            seed=3000, n_events=1500, n_repos=TAIL_REPOS, n_orgs=1,
            paths_per_repo=8, n_generations=1, streams_per_generation=4,
            gen_span_ms=60_000, content_min=64, content_max=256,
        ))
        tinfo = write_world(tw, os.path.join(work, "tail"))
        log = normalize_log(spark.read.parquet(tinfo["log_dir"]))
        # late schema evolution: every tail row carries flag='hot'
        log = log.withColumn("flag", F.lit("hot"))
        eng.sink.merge(fold_batch(log, eng.table), eng.sink.checkpoint())

        def timed_rows(df):
            t = time.time()
            n = df.count()
            return round(time.time() - t, 2), n

        def canon(df):
            return {
                tuple(r) for r in df.select(
                    "repo", "path",
                    *[F.coalesce(F.col(c), F.lit("\x02"))
                      for c in ("commit", "lang", "content", "flag")],
                ).collect()
            }

        sparse = [("flag", "=", "hot")]
        inf: dict = {}
        t0 = time.time()
        pruned_rows = canon(eng.sink.scan(sparse, info=inf))
        report["sparse_pruned_s"] = round(time.time() - t0, 2)
        report["sparse_pruning"] = inf
        t0 = time.time()
        full_rows = canon(eng.sink.scan(sparse, prune=False))
        report["sparse_full_s"] = round(time.time() - t0, 2)
        assert pruned_rows == full_rows, (len(pruned_rows), len(full_rows))
        report["sparse_rows"] = len(pruned_rows)
        report["sparse_equal"] = True
        report["sparse_speedup"] = round(
            report["sparse_full_s"] / max(report["sparse_pruned_s"], 1e-9), 1)

        # ---- 3. dense decorrelated control (honest non-win) -------------
        dense = [("lang", "=", "py")]
        inf2: dict = {}
        t0 = time.time()
        n_dense = eng.sink.scan(dense, info=inf2).count()
        report["dense_pruned_s"] = round(time.time() - t0, 2)
        report["dense_pruning"] = inf2
        t0 = time.time()
        n_dense_full = eng.sink.scan(dense, prune=False).count()
        report["dense_full_s"] = round(time.time() - t0, 2)
        assert n_dense == n_dense_full
        report["dense_rows"] = n_dense

        report["steal_s"] = round(_steal_s() - s0, 1)
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps(report))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
