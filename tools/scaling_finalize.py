"""Wrap a raw scaling campaign (tools/scaling_probe.py output, possibly
extended by tools/scaling_continue.py) into the analysis schema that
BASELINE.md documents and bench.py embeds (same shape as SCALING_r4.json:
rule / engine / world / protocol / attempt lists / best per level /
efficiency / control / raw).

Usage: python tools/scaling_finalize.py SCALING_r5.json [date] — rewrites
the file in place with the raw campaign preserved under
``scaling_probe_raw``. Idempotent: refuses to double-wrap.
"""

from __future__ import annotations

import json
import sys

ENGINE_DESC = (
    "round-5 final (sharded root-manifest index, commit-backend seam, "
    "per-group fixed-cost LPT fleet assignment with swap refinement)"
)


def main() -> None:
    path = sys.argv[1]
    date = sys.argv[2] if len(sys.argv) > 2 else "2026-08-18"
    with open(path) as f:
        raw = json.load(f)
    if "scaling_probe_raw" in raw:
        print("already finalized")
        return
    assert raw.get("done"), "campaign not finished"
    bn, b4 = raw["best_n"], raw["best_n4"]
    ctrl = raw.get("control", {})

    def best(side):
        att = [a for a in ctrl.get(side, []) if a["clean"]] or ctrl.get(side, [])
        return max(att, key=lambda a: a["events_per_sec"]) if att else None

    bc2, bc4 = best("c2x4"), best("c4x2")
    out = {
        "rule": (
            "throughput scaling efficiency >= 0.8 from N to 4N executors "
            "(BASELINE.json north_rule); evidenced at two parallelism "
            "levels on one host per task instructions"
        ),
        "engine": ENGINE_DESC,
        "world": {
            "events": raw["events"],
            "zipf_a": 1.1,
            "generations": 2,
            "spec": "bench._spec(60e6, 1.1), cached 64.9M-event world "
                    "(slab-generated this round; same spec as rounds 2-4)",
        },
        "protocol": {
            "date": date,
            "tool": "tools/scaling_probe.py + tools/scaling_continue.py "
                    "(raw output embedded below)",
            "executors": "one OS process per executor, own JVM, "
                         "LPT+swap-refined disjoint stream-group shards "
                         "(byte + per-file + per-group fixed-cost model), "
                         "full warm-up replay per executor, barrier start, "
                         "whole-VM steal sampled per attempt; attempt clean "
                         "iff steal_s/(wall*busy_cores) <= 0.05",
            "attempts": "levels interleaved (N, 4N, N, 4N) so both see the "
                        "same steal weather; best clean attempt per level; "
                        "campaign extended past the probe's 3-round cap by "
                        "scaling_continue.py after the first rounds ran in "
                        "visibly degraded host weather",
        },
        "n_attempts_events_per_sec": [
            a["events_per_sec"] for a in raw["pair"]["n"]],
        "n4_attempts_events_per_sec": [
            a["events_per_sec"] for a in raw["pair"]["n4"]],
        "best_n": bn,
        "best_n4": b4,
        "efficiency_raw_best_clean": raw["efficiency"],
        "equal_total_cores_control": {
            "c2x4_events_per_sec": bc2 and bc2["events_per_sec"],
            "c4x2_events_per_sec": bc4 and bc4["events_per_sec"],
            "c2x4_clean_attempts": sum(
                a["clean"] for a in ctrl.get("c2x4", [])),
            "c4x2_clean_attempts": sum(
                a["clean"] for a in ctrl.get("c4x2", [])),
            "ratio": raw.get("control_ratio"),
            "note": "8 busy cores both, >=2 clean attempts per side "
                    "(round-4 verdict asked for exactly this after the "
                    "single-attempt control flipped sides round-over-round)",
        },
        "comparison_to_r4": {
            "r4_n_best": 182249.1,
            "r4_n4_best": 643622.4,
            "r4_efficiency": 0.883,
            "r5_n_best": bn["events_per_sec"],
            "r5_n4_best": b4["events_per_sec"],
            "r5_efficiency": raw["efficiency"],
            "note": "world regenerated this round by the slab generator "
                    "(same spec, 64,887,924 vs 64,890,651 events)",
        },
        "scaling_probe_raw": raw,
    }
    # carry the shared-target evidence forward: writer-contention was
    # re-measured this round by tools/commit_contention.py
    # (CONTENTION_r5.json, 1-16 writers) and the 10^9-event campaign
    # (BIGWORLD_r5.json) runs 4x4c into one table; the r4 4-writer
    # bench-world number remains the comparable best-clean measurement
    try:
        import os
        r4p = os.path.join(os.path.dirname(path), "SCALING_r4.json")
        with open(r4p) as f:
            mw = json.load(f).get("multi_writer_shared_target")
        if mw:
            mw["note_r5"] = (
                "measured in round 4 on the same spec world; round 5 adds "
                "CONTENTION_r5.json (commit-path capacity at 1-16 writers, "
                "1k/16k buckets) and BIGWORLD_r5.json (4x4c shared target "
                "at 1.08B events)"
            )
            out["multi_writer_shared_target"] = mw
    except OSError:
        pass
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"efficiency": raw["efficiency"],
                      "best_n": bn["events_per_sec"],
                      "best_n4": b4["events_per_sec"],
                      "control_ratio": raw.get("control_ratio")}))


if __name__ == "__main__":
    main()
