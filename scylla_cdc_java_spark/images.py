"""Pre/post-image augmentation of a generated world (test fixtures for
modes PREIMAGE and POSTIMAGE — reference: scylla-cdc-replicator
Main.java:577-598 (postimage), 653-672 (preimage); Scylla emits image
rows sharing the change's timeuuid, ordered by batch sequence).

``with_images`` runs the pure-Python oracle sequentially over a world's
events and splices in:

- an op-0 PREIMAGE row *before* each sampled write/delete, carrying the
  row's visible state at that instant,
- an op-9 POSTIMAGE row *after* each write (ops 1/2), carrying the full
  row state after the change.

All rows are then re-sequenced (ms kept, ``seq`` renumbered in splice
order) so ``cdc$time`` stays globally tie-free while images sit
immediately adjacent to their change — the packed-ts analogue of
"same timeuuid, consecutive batch_seq_no".

Small-N fixtures only (sequential); the vectorized bench path uses
delta mode without images.
"""

from __future__ import annotations

import numpy as np

from .model import (
    OP_PREIMAGE,
    OP_POSTIMAGE,
    OP_ROW_DELETE,
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
    SEQ_MOD,
)
from .oracle import OracleState, apply_event


def with_images(
    world: dict,
    preimage_fraction: float = 0.5,
    postimage: bool = True,
    seed: int = 1234,
) -> dict:
    ev = world["events"]
    spec = world["spec"]
    n = len(ev["ms"])
    rng = np.random.default_rng(seed)
    take_pre = rng.random(n) < preimage_fraction

    cols = list(ev.keys())
    out: dict[str, list] = {k: [] for k in cols}
    st = OracleState()

    def copy_row(i, overrides):
        for k in cols:
            v = ev[k][i]
            out[k].append(overrides.get(k, v))

    value_cols = ("commit", "lang", "content")
    for i in range(n):
        op = ev["op"][i]
        repo, path = ev["repo"][i], ev["path"][i]
        if op in (OP_ROW_UPDATE, OP_ROW_INSERT, OP_ROW_DELETE) and take_pre[i]:
            before = st.visible_row(repo, path)
            over = {"op": OP_PREIMAGE, "ttl": None, "batch_seq": -1}
            for c in value_cols:
                over[c] = before[c] if before else None
                over["del_" + c] = None
            copy_row(i, over)
        copy_row(i, {})
        apply_event(
            st,
            {
                "op": op,
                "ms": ev["ms"][i],
                "seq": ev["seq"][i],
                "stream_id": ev["stream_id"][i],
                "repo": repo,
                "path": path,
                "commit": ev["commit"][i],
                "lang": ev["lang"][i],
                "content": ev["content"][i],
                "del_commit": ev["del_commit"][i],
                "del_lang": ev["del_lang"][i],
                "del_content": ev["del_content"][i],
            },
        )
        if postimage and op in (OP_ROW_UPDATE, OP_ROW_INSERT):
            after = st.visible_row(repo, path)
            over = {"op": OP_POSTIMAGE, "ttl": None, "batch_seq": 1}
            for c in value_cols:
                over[c] = after[c] if after else None
                over["del_" + c] = None
            copy_row(i, over)

    # re-sequence: keep ms, renumber seq in splice order (tie-free)
    out["seq"] = [j % SEQ_MOD for j in range(len(out["ms"]))]
    # oracle above consumed original (ms, seq); downstream consumers of the
    # augmented world must replay with the NEW seqs — rebuild cleanly
    return {"generations": world["generations"], "events": out, "spec": spec}


def filter_ops(events: dict, keep_ops: set[int]) -> dict:
    idx = [i for i, op in enumerate(events["op"]) if op in keep_ops]
    return {k: [v[i] for i in idx] for k, v in events.items()}
