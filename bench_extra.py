"""Round-6 optimization forensics — the noop-sink isolation harness
behind the numbers cited in OPTIMIZATION_r06.md.

NOT part of the driver contract: ``bench.py`` stays the frozen
measurement; this file exists so every phase-level claim (where a
query's time goes, what a rewrite bought) is reproducible.

Modes (all honor $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS):

  python bench_extra.py queries   # per-query noop timing, build vs exec
  python bench_extra.py minhash   # minhash pipeline phase isolation
  python bench_extra.py replay    # one replay window: scan/fold/write/tombs

Methodology per the optimization guide §1.4: every timing drives a
``noop`` sink write (computes every column of every row, no output
cost); per-phase numbers are best-of-N in a warm session; jobs are
labelled via setJobDescription.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session(cores: int):
    from scylla_cdc_java_spark.session import get_spark

    return get_spark(app=f"cdc-bench-extra-c{cores}",
                     master=f"local[{cores}]", shuffle_partitions=cores)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _best(fn, n: int = 3) -> float:
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


def mode_queries() -> dict:
    """Per-query: DataFrame BUILD time (driver-side expression tree +
    analysis — bench.py pays this inside its timed region because each
    execution rebuilds the query) and EXEC time (noop write)."""
    import __spark_entry__ as em

    spark = _session(min(CPUS, 16))
    qs = em.queries()
    out = {}
    for name in ("lww_last_writer", "col_fold_three_valued",
                 "windowed_scan", "range_pairing", "tombstone_lww",
                 "dedup_exact", "doc_quality", "lang_id", "minhash_lsh",
                 "ann_cosine_topk", "token_counts", "simhash",
                 "fingerprints"):
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        builds, execs = [], []
        for _ in range(2):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            t1 = time.time()
            _noop(df)
            builds.append(round(t1 - t0, 3))
            execs.append(round(time.time() - t1, 3))
        out[name] = {"build_s": min(builds), "exec_s": min(execs)}
    spark.stop()
    return out


def mode_minhash() -> dict:
    """Phase isolation for the dedup pipeline's slowest member."""
    from pyspark.sql import functions as F

    from scylla_cdc_java_spark.datapipe.dedup import (
        lsh_candidates_from_signatures,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    spark = _session(min(CPUS, 16))
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    out = {
        "signatures_noop_s": _best(lambda: _noop(minhash_signatures(docs))),
        "full_candidates_noop_s": _best(
            lambda: _noop(minhash_lsh_candidates(docs, bands=16))),
    }
    sig = minhash_signatures(docs).persist()
    sig.count()
    out["banding_from_cached_sigs_s"] = _best(
        lambda: _noop(lsh_candidates_from_signatures(sig)))
    sig.unpersist()
    # plan-shape assertions backing OPTIMIZATION_r06.md: one kernel
    # evaluation, no join in the skew guard
    plan = (minhash_lsh_candidates(docs, bands=16)
            ._jdf.queryExecution().executedPlan().toString())
    out["plan_mapinpandas_nodes"] = plan.count("MapInPandas")
    out["plan_join_nodes"] = plan.count("Join")
    spark.stop()
    return out


def mode_replay() -> dict:
    """One bench-spec replay window, phase by phase (scan -> fold ->
    delta write; tombstone subqueries) on the cached 30M-event world."""
    import shutil
    import tempfile

    import bench
    from pyspark.sql import functions as F

    from scylla_cdc_java_spark import Engine, EngineConfig
    from scylla_cdc_java_spark.operators.fold import fold_batch
    from scylla_cdc_java_spark.plans.windows import (
        EPOCH_START, compute_fetching_window,
    )

    info = bench.world_for(bench._spec(30_000_000))
    cores = min(CPUS, 16)
    spark = _session(cores)
    target = tempfile.mkdtemp(prefix="cdc_bextra_")
    eng = Engine(spark, info["log_dir"], info["generations_path"], target,
                 cfg=EngineConfig(window_length_limit_ms=600_000,
                                  num_buckets=max(32, cores),
                                  shuffle_partitions=cores))
    gens = eng.generations()
    w = compute_fetching_window(EPOCH_START, gens[1][0],
                                gens[1][0] + 10 ** 9, eng.cfg)
    sl = eng._read_window(gens[0][0], w)
    fold = fold_batch(sl, eng.table, [])
    out = {
        "scan_noop_s": _best(lambda: _noop(sl)),
        "fold_noop_s": _best(lambda: _noop(fold.key_state)),
        "part_tombs_noop_s": _best(lambda: _noop(fold.part_tombs)),
        "range_tombs_noop_s": _best(lambda: _noop(fold.range_tombs)),
    }

    def delta_write():
        d = tempfile.mkdtemp(prefix="cdc_bextra_w_")
        bx = F.pmod(F.xxhash64(F.col("repo")), F.lit(eng.sink.num_buckets))
        (fold.key_state.withColumn("__b", bx).repartition(F.col("__b"))
         .write.mode("overwrite").partitionBy("__b").parquet(d))
        shutil.rmtree(d, ignore_errors=True)

    out["delta_write_disk_s"] = _best(delta_write, n=2)
    spark.stop()
    shutil.rmtree(target, ignore_errors=True)
    return out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    fn = {"queries": mode_queries, "minhash": mode_minhash,
          "replay": mode_replay}[mode]
    print(json.dumps({"mode": mode, "sf_dir": SF_DIR, **fn()}))


if __name__ == "__main__":
    main()
