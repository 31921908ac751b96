"""Minor-compaction write-amplification probe (round 5).

tests/test_minor_compact.py proves VALUES; this probe measures what
the LSM size-ratio policy (``ParquetMergeSink.minor_compact_ratio``)
BUYS in the regime it exists for — the steady-state CDC tail, where
the table is much larger than a window's delta (at 100 TB: 10^10 rows
vs 10^5-row windows). The headline bench can't see this (2 protocol
windows, compaction never trips), and a from-scratch replay can't
either (while the table is still being built, every window's delta is
a big fraction of the base, and the policy honestly majors — measured
in the first version of this probe: zero minors fired).

Shape: one backfill merge (BASE_KEYS rows) + major compact to
establish bases, then N_WINDOWS small zipf-skewed update windows
(UPD_PER_WINDOW rows each, Pareto-approximated rank sampling, seeded)
with compact_threshold=4, per side:

- major-only (ratio=0, pre-round-5 behavior): every 4th window
  rewrites every touched bucket — O(table) per compaction cycle;
- lsm_minor (ratio=0.5 default): the same crossings fold only the
  accumulated deltas — O(live delta).

Metrics: DETERMINISTIC write bytes under ``data/`` by segment role
(retention is unbounded here, so the tree is the full write history),
commit-op counts, wall + steal per side (interleaved), and a final
value digest that MUST match across sides. The bytes ratio is the
scale-invariant result: it multiplies with table-to-window size ratio.

Usage: python tools/minor_compact_bench.py [out.json] [--smoke]
Env: SPARK_GRAFT_CPUS (default 16).
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
NUM_BUCKETS = 64


def _steal_s() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / os.sysconf("SC_CLK_TCK")


def _role_bytes(target: str) -> dict:
    """Bytes ever written under data/, by segment role, classifying
    rows/ trees as merge vs minor via the retained commit log."""
    out = {"merge_delta": 0, "minor_delta": 0, "base": 0, "tombs": 0}
    droot = os.path.join(target, "data")
    ops_by_version = {}
    mdir = os.path.join(target, "manifests")
    if os.path.isdir(mdir):
        for f in os.listdir(mdir):
            if f.endswith(".json"):
                try:
                    with open(os.path.join(mdir, f)) as fh:
                        m = json.load(fh)
                    ops_by_version[int(m["version"])] = m.get(
                        "operation", "?")
                except Exception:
                    pass
    for vdir in os.listdir(droot) if os.path.isdir(droot) else []:
        try:
            planned_v = int(vdir.split("-", 1)[0][1:])
        except Exception:
            planned_v = -1
        op = ops_by_version.get(planned_v, "?")
        for role in os.listdir(os.path.join(droot, vdir)):
            rdir = os.path.join(droot, vdir, role)
            nbytes = 0
            for dirpath, _dn, fnames in os.walk(rdir):
                nbytes += sum(
                    os.path.getsize(os.path.join(dirpath, f))
                    for f in fnames)
            if role == "base":
                out["base"] += nbytes
            elif role == "tombs":
                out["tombs"] += nbytes
            elif op == "compact_minor":
                out["minor_delta"] += nbytes
            else:
                out["merge_delta"] += nbytes
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = args[0] if args else os.path.join(
        REPO, "MINORCOMPACT_r5.json")
    smoke = "--smoke" in sys.argv

    from pyspark.sql import functions as F

    from scylla_cdc_java_spark.model import TableConfig
    from scylla_cdc_java_spark.operators.fold import (
        fold_batch,
        normalize_log,
    )
    from scylla_cdc_java_spark.session import get_spark
    from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

    base_keys = 20_000 if smoke else 400_000
    n_windows = 8 if smoke else 24
    upd_per_window = 500 if smoke else 10_000
    zipf_a = 1.2

    spark = get_spark(app="minor-compact-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    tbl = TableConfig()

    def _log(df):
        """CDC-log rows from (key_id, ms, seq, lang) — all columns
        derived JVM-side, no Python per-row work."""
        return normalize_log(df.select(
            F.encode(F.lit("\x0e" * 16), "utf-8").alias("cdc$stream_id"),
            F.struct(F.col("ms").cast("long").alias("ms"),
                     F.col("seq").cast("long").alias("seq")
                     ).alias("cdc$time"),
            F.col("op").cast("tinyint").alias("cdc$operation"),
            F.concat(F.lit("org/r"),
                     F.lpad(F.col("key_id").cast("string"), 7, "0")
                     ).alias("repo"),
            F.lit("main.x").alias("path"),
            F.sha1(F.concat(F.col("key_id").cast("string"),
                            F.lit(":"), F.col("ms").cast("string"))
                   ).alias("commit"),
            F.col("lang"),
            F.concat(F.lit("body-"), F.col("key_id").cast("string")
                     ).alias("content"),
        ))

    def _backfill():
        return _log(spark.range(base_keys).select(
            F.col("id").alias("key_id"),
            F.lit(10).alias("ms"), F.col("id").alias("seq"),
            F.lit(2).alias("op"), F.lit("py").alias("lang")))

    def _updates(w):
        # Pareto-approximated zipf ranks, deterministic per (window, i):
        # u = fractional hash -> rank = u^(-1/(a-1)) clipped to keyspace
        u = (F.pmod(F.xxhash64(F.lit(f"w{w}:"), F.col("id")),
                    F.lit(1_000_000)) + 1) / 1_000_000.0
        # clip BEFORE the cast: u^-5 can exceed long range (ANSI mode
        # throws on cast overflow)
        rank = F.least(
            F.pow(u, F.lit(-1.0 / (zipf_a - 1.0))) - 1,
            F.lit(float(base_keys - 1))).cast("long")
        return _log(spark.range(upd_per_window).select(
            rank.alias("key_id"),
            F.lit(100 + w).alias("ms"), F.col("id").alias("seq"),
            F.lit(1).alias("op"),
            F.lit(["go", "rs", "zig", "ml"][w % 4]).alias("lang")))

    report: dict = {
        "metric": ("compaction write bytes + wall: major-only vs LSM "
                   "minor policy, steady-state tail (big base, small "
                   "zipf update windows)"),
        "base_keys": base_keys, "n_windows": n_windows,
        "upd_per_window": upd_per_window, "zipf_a": zipf_a,
        "num_buckets": NUM_BUCKETS, "compact_threshold": 4,
        "cores": CPUS, "sides": {},
    }
    digests = {}
    work = tempfile.mkdtemp(prefix="minor_bench_")
    try:
        for label, ratio in (("major_only", 0.0), ("lsm_minor", 0.5)):
            target = os.path.join(work, f"t_{label}")
            sink = ParquetMergeSink(
                spark, target, tbl, num_buckets=NUM_BUCKETS,
                compact_threshold=4, minor_compact_ratio=ratio)
            sink.merge(fold_batch(_backfill(), tbl), {"step": 0})
            sink.compact(buckets=list(range(NUM_BUCKETS)))
            b0 = _role_bytes(target)
            s0, t0 = _steal_s(), time.time()
            compact_s = minor_s = 0.0
            for w in range(n_windows):
                st = sink.merge(fold_batch(_updates(w), tbl),
                                {"step": w + 1})
                compact_s += st.get("compact_s", 0.0)
                minor_s += st.get("minor_compact_s", 0.0)
            wall = time.time() - t0
            steal = _steal_s() - s0
            hist = sink.history()
            b1 = _role_bytes(target)
            tail_bytes = {k: b1[k] - b0[k] for k in b1}
            report["sides"][label] = {
                "ratio": ratio,
                "tail_wall_s": round(wall, 2),
                "steal_s": round(steal, 1),
                "compact_s": round(compact_s, 2),
                "minor_compact_s": round(minor_s, 2),
                "commit_ops": {
                    op: sum(1 for h in hist if h["operation"] == op)
                    for op in {h["operation"] for h in hist}
                },
                "tail_bytes_by_role": tail_bytes,
                "tail_compaction_mb": round(
                    (tail_bytes["base"] + tail_bytes["minor_delta"])
                    / 1e6, 2),
            }
            line = F.concat_ws(
                "\x01", "repo", "path",
                *[F.coalesce(F.col(c), F.lit("\x02"))
                  for c in ("commit", "lang", "content")])
            r = sink.read().select(
                F.count("*").alias("n"),
                F.sum(F.crc32(line)).alias("s")).collect()[0]
            digests[label] = (r["n"], int(r["s"] or 0))
        assert digests["major_only"] == digests["lsm_minor"], digests
        report["final_state_digest_equal"] = True
        report["digest"] = list(digests["major_only"])
        a = report["sides"]["major_only"]
        b = report["sides"]["lsm_minor"]
        report["compaction_bytes_ratio_major_over_minor"] = round(
            a["tail_compaction_mb"] / max(b["tail_compaction_mb"], 1e-9),
            2)
        report["compaction_wall_ratio"] = round(
            (a["compact_s"] + a["minor_compact_s"])
            / max(b["compact_s"] + b["minor_compact_s"], 1e-9), 2)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
