"""Pre/post-image augmentation of a generated world (test fixtures for
modes PREIMAGE and POSTIMAGE — reference: scylla-cdc-replicator
Main.java:577-598 (postimage), 653-672 (preimage); Scylla emits image
rows sharing the change's timeuuid, ordered by batch sequence).

``with_images`` runs the pure-Python oracle sequentially over a world's
events and splices in:

- an op-0 PREIMAGE row *before* each sampled write/delete, carrying the
  row's visible state at that instant — scalar columns AND non-frozen
  collection columns (the reference's checkPreimage walks every column
  definition of the row, Main.java:619-651),
- an op-9 POSTIMAGE row *after* each write (ops 1/2), carrying the full
  row state after the change (a postimage binds the full collection —
  overwrite semantics).

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
    DEFAULT_TABLE,
    OP_PREIMAGE,
    OP_POSTIMAGE,
    OP_ROW_DELETE,
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
    SEQ_MOD,
    TableConfig,
)
from .oracle import OracleState, apply_event


def with_images(
    world: dict,
    preimage_fraction: float = 0.5,
    postimage: bool = True,
    seed: int = 1234,
    table: TableConfig = DEFAULT_TABLE,
) -> dict:
    ev = world["events"]
    spec = world["spec"]
    n = len(ev["ms"])
    rng = np.random.default_rng(seed)
    take_pre = rng.random(n) < preimage_fraction

    cols = list(ev.keys())
    out: dict[str, list] = {k: [] for k in cols}
    st = OracleState(table=table)

    def copy_row(i, overrides):
        for k in cols:
            v = ev[k][i]
            out[k].append(overrides.get(k, v))

    value_cols = tuple(table.value_columns)
    coll_cols = tuple(c for c in table.collection_columns if c in ev)

    def ev_dict(i):
        d = {
            "op": ev["op"][i],
            "ms": ev["ms"][i],
            "seq": ev["seq"][i],
            "ttl": ev["ttl"][i] if "ttl" in ev else None,
            "stream_id": ev["stream_id"][i],
        }
        for c in (*table.partition_key, *table.clustering_key, *value_cols):
            d[c] = ev[c][i]
        for c in value_cols:
            d["del_" + c] = ev["del_" + c][i]
        for c in coll_cols:
            d[c] = ev[c][i]
            d["del_" + c] = ev.get("del_" + c, [None] * n)[i]
            d["del_elements_" + c] = ev.get("del_elements_" + c, [None] * n)[i]
        return d

    def image_overrides(op_code, state_row, repo, path):
        over = {"op": op_code, "ttl": None, "batch_seq": -1 if op_code == OP_PREIMAGE else 1}
        for c in value_cols:
            over[c] = state_row[c] if state_row else None
            over["del_" + c] = None
        for c in coll_cols:
            # the image carries the VISIBLE map (live elements only)
            over[c] = st.visible_collection(repo, st._ck(path), c)
            over["del_" + c] = None
            over["del_elements_" + c] = None
        return over

    for i in range(n):
        op = ev["op"][i]
        repo, path = st.pk_of(ev_dict(i)), ev[table.clustering_key[0]][i]
        if len(table.clustering_key) > 1:
            path = tuple(ev[c][i] for c in table.clustering_key)
        if op in (OP_ROW_UPDATE, OP_ROW_INSERT, OP_ROW_DELETE) and take_pre[i]:
            before = st.visible_row(repo, path)
            copy_row(i, image_overrides(OP_PREIMAGE, before, repo, path))
        copy_row(i, {})
        apply_event(st, ev_dict(i))
        if postimage and op in (OP_ROW_UPDATE, OP_ROW_INSERT):
            after = st.visible_row(repo, path)
            copy_row(i, image_overrides(OP_POSTIMAGE, after, repo, path))

    # re-sequence: keep ms, renumber seq in splice order (tie-free)
    out["seq"] = [j % SEQ_MOD for j in range(len(out["ms"]))]
    # oracle above consumed original (ms, seq); downstream consumers of the
    # augmented world must replay with the NEW seqs — rebuild cleanly
    return {"generations": world["generations"], "events": out, "spec": spec}


def filter_ops(events: dict, keep_ops: set[int]) -> dict:
    idx = [i for i, op in enumerate(events["op"]) if op in keep_ops]
    return {k: [v[i] for i in idx] for k, v in events.items()}
