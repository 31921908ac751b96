"""Benchmark driver: headline CDC replay throughput + operator queries.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "replay": {"events": N, "events_per_sec": ..., ...}, ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

--scaling additionally runs the SAME replay at local[N] and local[4N]
(N = cpus/4) on the same input and reports throughput at both plus the
scaling efficiency (the sandbox stand-in for the N vs 4N executor
cluster rule — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/spark_graft_bench")

# headline query subset (the rest run in the correctness gate)
BENCH_QUERIES = [
    "lww_last_writer",
    "col_fold_three_valued",
    "windowed_scan",
    "range_pairing",
    "tombstone_lww",
    "dedup_exact",
    "doc_quality",
    "lang_id",
    "minhash_lsh",
    "ann_cosine_topk",
]


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _bench_spec(sf: float):
    from scylla_cdc_java_spark import GenSpec

    n = max(20_000, int(20_000_000 * sf))
    return GenSpec(
        seed=42,
        n_events=n,
        n_repos=max(200, int(n / 500)),
        n_orgs=50,
        paths_per_repo=64,
        n_generations=2,
        streams_per_generation=64,
        gen_span_ms=600_000,
        content_min=64,
        content_max=256,
    )


def _replay_once(master_cores: int, info: dict, tag: str,
                 shuffle_partitions: int | None = None) -> dict:
    from scylla_cdc_java_spark import Engine, EngineConfig
    from scylla_cdc_java_spark.session import get_spark

    spark = get_spark(
        app=f"cdc-bench-{tag}",
        master=f"local[{master_cores}]",
        shuffle_partitions=shuffle_partitions or master_cores,
    )
    target = tempfile.mkdtemp(prefix=f"cdc_bench_target_{tag}_")
    try:
        eng = Engine(
            spark,
            info["log_dir"],
            info["generations_path"],
            target,
            cfg=EngineConfig(
                window_length_limit_ms=600_000,
                num_buckets=max(32, master_cores),
                shuffle_partitions=shuffle_partitions or master_cores,
            ),
        )
        t0 = time.time()
        stats = eng.replay(collect_group_metrics=False)
        wall = time.time() - t0
        n_rows = info["n_rows"]
        final_rows = eng.sink.read().count()
        return {
            "cores": master_cores,
            "events": n_rows,
            "wall_s": round(wall, 2),
            "events_per_sec": round(n_rows / wall, 1),
            "windows": stats.windows,
            "final_table_rows": final_rows,
        }
    finally:
        shutil.rmtree(target, ignore_errors=True)
        spark.stop()


def main() -> None:
    scaling = "--scaling" in sys.argv
    sf = _sf_of(SF_DIR)

    from scylla_cdc_java_spark import generate_to_dir

    spec = _bench_spec(sf)
    t_gen = time.time()
    info = generate_to_dir(spec, CACHE)
    gen_s = time.time() - t_gen

    # ---- headline: CDC replay at full parallelism --------------------
    replay = _replay_once(CPUS, info, f"c{CPUS}")

    # ---- operator queries --------------------------------------------
    import __spark_entry__ as entrymod
    from scylla_cdc_java_spark.session import get_spark

    spark = get_spark(app="cdc-bench-queries", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    qtimes: dict[str, float] = {}
    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        qtimes[name] = round(time.time() - t0, 3)
    spark.stop()

    out = {
        "metric": "cdc replay events/sec + operator suite runtime",
        "value": round(replay["wall_s"] + sum(qtimes.values()), 2),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "replay": replay,
        "gen_cached_s": round(gen_s, 2),
        "events_per_sec": replay["events_per_sec"],
    }

    if scaling:
        n_small = max(2, CPUS // 4)
        small = _replay_once(n_small, info, f"c{n_small}")
        big = replay
        eff = (big["events_per_sec"] / small["events_per_sec"]) / (
            CPUS / n_small
        )
        out["scaling"] = {
            "n_cores": n_small,
            "n4_cores": CPUS,
            "n_events_per_sec": small["events_per_sec"],
            "n4_events_per_sec": big["events_per_sec"],
            "efficiency": round(eff, 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
