"""Interleaved A/B(/C) probe for a single bench query across code
versions. Settles "did the code regress or was it weather?" the same
way the round-4 force-compaction regression was caught: alternate
attempts A,B,C,A,B,C,... each in a FRESH JVM subprocess, on one
machine-quiet window, recording per-attempt host weather (CPU steal +
fresh-page fault GB/s, tools/weather.py) so attempts are comparable.

Each attempt runs the query twice in the warm session (bench.py
protocol: first run pays janino codegen, min-of-2 is the headline) and
reports both. Verdict logic is left to the reader: medians per side
with interleaving means any systematic side difference is code, any
common drift is weather.

Usage:
  python tools/ab_query.py QUERY out.json LABEL=REPO_DIR [LABEL=REPO_DIR ...]
Env: AB_REPS (default 5), AB_CORES (16), SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
query = sys.argv[2]
cores = int(sys.argv[3])
from scylla_cdc_java_spark.session import get_spark
import __spark_entry__ as entrymod
spark = get_spark(app="ab", master=f"local[{cores}]",
                  shuffle_partitions=cores)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
q = entrymod.queries()[query]
runs = []
for _ in range(2):
    t0 = time.time()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs.append(round(time.time() - t0, 3))
print("RESULT " + json.dumps(runs))
spark.stop()
"""


def steal_s() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / os.sysconf("SC_CLK_TCK")


def main() -> None:
    query, out_path = sys.argv[1], sys.argv[2]
    sides = [a.split("=", 1) for a in sys.argv[3:]]
    reps = int(os.environ.get("AB_REPS", "5"))
    cores = int(os.environ.get("AB_CORES", "16"))
    sys.path.insert(0, HERE)
    from weather import fault_gb_s

    attempts = []
    for rep in range(reps):
        for label, repo in sides:
            w = fault_gb_s(256)
            s0, t0 = steal_s(), time.time()
            p = subprocess.run(
                [sys.executable, "-c", CHILD, repo, query, str(cores)],
                capture_output=True, text=True, timeout=600)
            wall = time.time() - t0
            line = next((ln for ln in p.stdout.splitlines()
                         if ln.startswith("RESULT ")), None)
            runs = json.loads(line[7:]) if line else None
            att = {
                "rep": rep, "side": label, "runs_s": runs,
                "attempt_wall_s": round(wall, 1),
                "steal_s": round(steal_s() - s0, 1),
                "fault_gb_s_before": round(w, 2),
            }
            attempts.append(att)
            print(json.dumps(att), flush=True)
            if runs is None:
                print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)

    summary = {}
    for label, _ in sides:
        warm = [min(a["runs_s"]) for a in attempts
                if a["side"] == label and a["runs_s"]]
        cold = [a["runs_s"][0] for a in attempts
                if a["side"] == label and a["runs_s"]]
        summary[label] = {
            "warm_best_s": {"median": round(statistics.median(warm), 3),
                            "min": min(warm), "all": warm},
            "cold_s": {"median": round(statistics.median(cold), 3),
                       "min": min(cold)},
        }
    out = {"query": query, "cores": cores, "reps": reps,
           "sides": {l: r for l, r in sides},
           "summary": summary, "attempts": attempts}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"summary": summary}, indent=1))


if __name__ == "__main__":
    main()
