"""Definitive N-vs-4N pair with resource-normalized N: interleaved
(fleet 4x1, ballast-N) measurements in the same weather window.

    efficiency = fleet_4x1.events_per_sec / (4 * ballast_N.events_per_sec)

See tools/ballast_n.py for why the N level must be measured on an
equally-loaded host (solo 1-core runs boost ~20-30% on this chip, which
no real same-spec executor host would relative to its 4N peers).

Usage: python tools/normalized_pair.py [rounds] [out.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ballast_n import run_ballast_n  # noqa: E402
from fleet_replay import run_fleet  # noqa: E402

CACHE = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/spark_graft_bench")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/normalized_pair.json"

    from bench import _spec, world_for

    n = int(os.environ.get("SPARK_GRAFT_SCALING_EVENTS", "60000000"))
    z = float(os.environ.get("SPARK_GRAFT_SCALING_ZIPF", "1.1"))
    info = world_for(_spec(n, z), CACHE)

    state: dict = {"events": info["n_rows"], "rounds": [], "done": False}

    def flush():
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1)
        os.replace(tmp, out_path)

    for r in range(rounds):
        fleet = run_fleet(info["log_dir"], info["generations_path"], 4, 1)
        ballast = run_ballast_n(info["log_dir"], info["generations_path"])
        eff = fleet["events_per_sec"] / (4 * ballast["events_per_sec"])
        state["rounds"].append(
            {"fleet_4x1": fleet, "ballast_n": ballast,
             "normalized_efficiency": round(eff, 3)}
        )
        flush()

    best = max(r["normalized_efficiency"] for r in state["rounds"])
    state["best_normalized_efficiency"] = best
    state["done"] = True
    flush()
    print(json.dumps({"best_normalized_efficiency": best}))


if __name__ == "__main__":
    main()
