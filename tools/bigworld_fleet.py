"""10^9-event campaign: slab-generated world -> 4x4c fleet into ONE
shared table with an external compactor running -> subset-oracle exact
check. The round-5 stretch of tools/bigworld_check.py (10^8, single
session, private target): this exercises the full concurrent stack —
multi-writer serializable commits, per-shard checkpoints, cross-process
maintenance — at another order of magnitude.

Correctness at this scale uses PARTITION-KEY INDEPENDENCE (see
bigworld_check.py): restrict both the final table and the oracle replay
to a ~1% crc32 subset of repos; range pairs survive the filter because
both ends share their repo and stream.

The world spec trims content to 12-40 chars (vs the bench world's
64-256) so 10^9 events fit the sandbox disk — the protocol cost per
event (fold, tombstones, commits) is unchanged; events/s is reported
against this spec, not compared to the content-heavy bench world.

Usage: python tools/bigworld_fleet.py [out.json]
Env: BIGWORLD_EVENTS (default 10^9), BIGWORLD_EXECS (4),
     BIGWORLD_CORES (4), SUBSET_MOD (100), BIGWORLD_KEEP_WORLD.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# This VM faults fresh anonymous pages at ~30 MB/s while reused arena
# memory streams at ~5 GB/s (measured: 2 GB `a*2` first-touch 69 s,
# second iteration 0.37 s). Generation at 10^9 only works if every slab
# reuses the previous slab's freed memory: pin glibc to one arena that
# never trims or mmaps large blocks, and point Arrow at the same glibc
# pool (its bundled jemalloc purges dirty pages back to the fault path).
_TUNED_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "1099511627776",
    "MALLOC_TRIM_THRESHOLD_": "1099511627776",
    "MALLOC_TOP_PAD_": "1073741824",
    "MALLOC_ARENA_MAX": "1",
    "ARROW_DEFAULT_MEMORY_POOL": "system",
}
if os.environ.get("ARROW_DEFAULT_MEMORY_POOL") != "system":
    os.execve(sys.executable, [sys.executable] + sys.argv,
              {**os.environ, **_TUNED_ENV})

CACHE = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/spark_graft_bench")
EVENTS = int(os.environ.get("BIGWORLD_EVENTS", "1000000000"))
EXECS = int(os.environ.get("BIGWORLD_EXECS", "4"))
CORES = int(os.environ.get("BIGWORLD_CORES", "4"))
SUBSET_MOD = int(os.environ.get("SUBSET_MOD", "100"))
SLAB_EVENTS = 25_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from scylla_cdc_java_spark import GenSpec
    from scylla_cdc_java_spark.biggen import generate_to_dir_sharded
    from scylla_cdc_java_spark.oracle import final_state, replay
    from scylla_cdc_java_spark.session import get_spark
    from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink
    from tools.fleet_replay import run_fleet

    def steal_s() -> float:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8]) / os.sysconf("SC_CLK_TCK")

    spec = GenSpec(
        seed=42, n_events=EVENTS, n_repos=max(200, EVENTS // 500),
        n_orgs=50, paths_per_repo=64, n_generations=2,
        streams_per_generation=64, gen_span_ms=600_000, zipf_a=1.1,
        content_min=12, content_max=40,
    )
    n_slabs = max(1, EVENTS // SLAB_EVENTS)
    t0 = time.time()
    info = generate_to_dir_sharded(
        spec, CACHE, n_slabs,
        progress=lambda i, n, rows: print(
            f"gen slab {i}/{n} ({rows:,} rows)", flush=True))
    gen_s = time.time() - t0
    world_bytes = int(subprocess.run(
        ["du", "-sb", info["out_dir"]], capture_output=True,
        text=True).stdout.split()[0])
    out: dict = {
        "events": info["n_rows"],
        "gen_s": round(gen_s, 1),
        "world_gb": round(world_bytes / 2**30, 1),
        "fleet": f"{EXECS}x{CORES}c shared target, external compactor",
    }
    print(json.dumps({k: out[k] for k in ("events", "gen_s", "world_gb")}),
          flush=True)

    workdir = os.path.join(CACHE, "bigworld_fleet_work")
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    shared_table = os.path.join(workdir, "shared_table")

    comp_log = os.path.join(workdir, "compactor.jsonl")
    comp = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "compactor.py"),
         shared_table, "--interval", "20", "--until-done",
         "--expect-shards", str(EXECS), "--grace", "30",
         "--retain-snapshots", "1", "--cores", "4", "--out", comp_log],
        stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT,
    )
    env_save = {k: os.environ.get(k) for k in
                ("FLEET_SKIP_WARM", "FLEET_WINDOW_MS", "FLEET_NUM_BUCKETS")}
    os.environ["FLEET_SKIP_WARM"] = "1"  # 10^9 warm-up replay: no
    os.environ["FLEET_WINDOW_MS"] = "150000"  # 8 windows, bounded shuffle
    os.environ["FLEET_NUM_BUCKETS"] = "64"
    try:
        s0 = steal_s()
        res = run_fleet(info["log_dir"], info["generations_path"],
                        EXECS, CORES, heap="20g", shared_target=True,
                        workdir=workdir, keep=True)
        res["steal_s_campaign"] = round(steal_s() - s0, 1)
        out["replay"] = res
        print(json.dumps(res), flush=True)

        comp.wait(timeout=600)
        out["compactor_rounds"] = sum(
            1 for _ in open(comp_log)) if os.path.exists(comp_log) else 0

        # ---- subset oracle ------------------------------------------
        spark = get_spark(app="bigworld-check", master="local[16]",
                          shuffle_partitions=16)
        pred = F.pmod(F.crc32(F.encode(F.col("repo"), "UTF-8")),
                      F.lit(SUBSET_MOD)) == 0
        log = spark.read.parquet(info["log_dir"]).where(pred)
        cols = {
            "op": F.col("cdc$operation"), "ms": F.col("cdc$time.ms"),
            "seq": F.col("cdc$time.seq"), "ttl": F.col("cdc$ttl"),
            "stream_id": F.col("cdc$stream_id"),
        }
        for c in ("repo", "path", "commit", "lang", "content"):
            cols[c] = F.col(c)
        for c in ("commit", "lang", "content"):
            cols["del_" + c] = F.col(f"cdc$deleted_{c}")
        pdf = (
            log.select([v.alias(k) for k, v in cols.items()])
            .toPandas()
            .sort_values(["ms", "seq"], kind="mergesort")
            .reset_index(drop=True)
        )
        out["subset_events"] = len(pdf)
        ev = {k: pdf[k].tolist() for k in pdf.columns}
        ev["stream_id"] = [bytes(s) for s in ev["stream_id"]]

        def _opt_int(v):
            try:
                return None if v is None or v != v else int(v)
            except TypeError:
                return None

        def _opt_bool(v):
            try:
                return None if v is None or v != v else bool(v)
            except TypeError:
                return None

        ev["ttl"] = [_opt_int(v) for v in ev["ttl"]]
        for c in ("del_commit", "del_lang", "del_content"):
            ev[c] = [_opt_bool(v) for v in ev[c]]
        t1 = time.time()
        want = sorted(
            (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
            for r in final_state(replay(ev))
        )
        out["oracle_s"] = round(time.time() - t1, 1)

        sink = ParquetMergeSink.for_existing(spark, shared_table)
        got = sorted(
            (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
            for r in sink.read().where(pred).collect()
        )
        out["subset_rows"] = len(got)
        out["state_match"] = bool(got == want)
        if not out["state_match"]:
            diff = set(got) ^ set(want)
            out["diff_sample"] = [list(x) for x in list(diff)[:5]]
        spark.stop()
    finally:
        if comp.poll() is None:
            comp.terminate()
        for k, v in env_save.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        shutil.rmtree(workdir, ignore_errors=True)
        if not os.environ.get("BIGWORLD_KEEP_WORLD"):
            shutil.rmtree(info["out_dir"], ignore_errors=True)

    print(json.dumps(out), flush=True)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
