"""PREIMAGE consistency verification (op 0) — re-creation of the
replicator's preimage mode (reference: scylla-cdc-replicator
Main.java:619-672): for every op-0 row the destination's current row is
point-read and compared column-by-column; differences are reported as
"Inconsistency detected".

Batch re-formulation: a preimage row at time T asserts the row's visible
state *just before T*. That state is the LWW fold of
(target state from previous batches) ∪ (this batch's events with ts < T).
We reconstruct it per key with a grouped ``applyInPandas`` — the only
place the engine needs per-row sequential logic, and it runs only over
keys that actually carry preimage rows (a small slice), Arrow-batched:

1. SQL side: filter op-0 rows; semi-join the batch's write/delete events
   to those keys; expand partition/range deletes into per-key pseudo
   row-deletes (broadcast joins — they are rare); convert the target's
   stored per-cell (value, _ts) state into one *seed* pseudo-event per
   key (its cells already fold all previous batches).
2. Pandas side (per key): seed -> replay events in ts order -> at each
   preimage row compare expected vs current visible state -> emit one
   mismatch row per differing column.

Returns a DataFrame (repo, path, ts, col, expected, actual); empty means
consistent (the reference logs mismatches, Main.java:640-649).

Scope: scalar value columns AND non-frozen collection columns — the
reference's checkPreimage walks every column definition of the row
(Main.java:625-639), collections included. Collection state (element
maps, whole-map overwrite tombstones, per-element removals) crosses the
SQL→pandas boundary as JSON strings (tiny: preimage keys only) and is
replayed element-wise; the asserted map is compared as a canonical
sorted-key dict, reported as JSON on mismatch.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..model import (
    COL_MARKER_TS,
    COL_OP,
    COL_TOMB_TS,
    COL_TS,
    OP_PARTITION_DELETE,
    OP_PREIMAGE,
    OP_ROW_DELETE,
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
    TableConfig,
    ctomb_col,
    deleted_col,
    deleted_elements_col,
    ts_col,
)

OP_SEED = -1
NEG_INF = -1


def _canon_map(d: dict | None) -> str | None:
    """Canonical JSON of a visible map; None for empty/absent (a row
    with no live elements asserts NULL, matching the oracle's
    visible_collection)."""
    if not d:
        return None
    return json.dumps(d, sort_keys=True, separators=(",", ":"))


def verify_preimages(sink, table: TableConfig, slice_df: DataFrame,
                     fold) -> int:
    """Count op-0 mismatches for one window/batch BEFORE it is applied
    (replicator preimage mode, Main.java:653-672). The target read is
    bucket-pruned to the partitions that actually carry preimage rows
    (one column-pruned scan of the slice) — the merge-on-read resolve
    then touches only those buckets, never the whole table. ONE
    implementation shared by every consumption surface — batch
    ``Engine.replay``, poll-loop ``Engine.tail`` and the Structured
    Streaming ``StructuredTail`` — so the mode's verification guarantee
    cannot silently vanish on any of them."""
    pre_buckets = [
        r["b"]
        for r in slice_df.where(F.col(COL_OP) == OP_PREIMAGE)
        .select(sink._bucket_expr().alias("b"))
        .distinct()
        .collect()
    ]
    if not pre_buckets:
        return 0
    mism = check_preimages(
        slice_df, sink.read_physical(pre_buckets),
        table, range_tombs=fold.range_tombs,
    )
    return mism.count()


def check_preimages(
    batch_df: DataFrame,
    target_physical: DataFrame,
    table: TableConfig,
    range_tombs: DataFrame | None = None,
) -> DataFrame:
    """batch_df: normalized log slice (has cdc$ts). target_physical: the
    sink's stored rows (previous batches folded). range_tombs: closed
    ranges of this batch (from fold_batch), for before-state accuracy."""
    union, check, out_schema, pk = _build_union(
        batch_df, target_physical, table, range_tombs
    )
    return union.groupBy(*pk).applyInPandas(check, schema=out_schema)


def _build_union(
    batch_df: DataFrame,
    target_physical: DataFrame,
    table: TableConfig,
    range_tombs: DataFrame | None = None,
):
    """SQL half of the preimage check, exposed for white-box tests:
    returns (union_df, per-key pandas check fn, output schema, pk)."""
    pk = list(table.primary_key)
    value_cols = [
        c for c in table.value_columns if c in batch_df.columns
    ]
    coll_cols = [
        c for c in table.collection_columns if c in batch_df.columns
    ]

    pre = batch_df.where(F.col(COL_OP) == OP_PREIMAGE)
    keys = pre.select(*pk).distinct()

    def ev_shape(df, op_expr, ts_expr, with_values: bool):
        cols = [
            *[F.col(c) for c in pk],
            op_expr.cast("int").alias("op"),
            ts_expr.cast("long").alias("ts"),
        ]
        for c in value_cols:
            if with_values:
                cols += [F.col(c), F.coalesce(F.col(deleted_col(c)), F.lit(False)).alias("d_" + c)]
            else:
                cols += [F.lit(None).cast("string").alias(c), F.lit(False).alias("d_" + c)]
            cols += [F.lit(None).cast("string").alias("sts_" + c)]
        for c in coll_cols:
            if with_values:
                cols += [
                    F.to_json(F.col(c)).alias("m_" + c),
                    F.coalesce(F.col(deleted_col(c)), F.lit(False)).alias("dm_" + c),
                    F.to_json(F.col(deleted_elements_col(c))).alias("de_" + c),
                ]
            else:
                cols += [
                    F.lit(None).cast("string").alias("m_" + c),
                    F.lit(False).alias("dm_" + c),
                    F.lit(None).cast("string").alias("de_" + c),
                ]
            cols += [
                F.lit(None).cast("string").alias("sm_" + c),
                F.lit(None).cast("string").alias("sct_" + c),
            ]
        cols += [
            F.lit(None).cast("string").alias("seed_marker"),
            F.lit(None).cast("string").alias("seed_tomb"),
        ]
        return df.select(*cols)

    # batch write/delete/preimage events for preimage keys only
    evs = batch_df.where(
        F.col(COL_OP).isin([OP_ROW_UPDATE, OP_ROW_INSERT, OP_ROW_DELETE, OP_PREIMAGE])
    ).join(keys, pk, "left_semi")
    evs = ev_shape(evs, F.col(COL_OP), F.col(COL_TS), with_values=True)

    # partition deletes -> pseudo row-deletes for every preimage key of
    # that partition (broadcast: op-4 rows are rare); every op-4 event
    # individually: a preimage between two partition deletes of the same
    # key must see only the earlier one. Joined on ALL partition columns
    # (composite keys, Main.java:176-198).
    part_key = list(table.partition_key)
    part = (
        batch_df.where(F.col(COL_OP) == OP_PARTITION_DELETE)
        .select(*part_key, F.col(COL_TS).alias("_pts"))
        .distinct()
    )
    pseudo_part = keys.join(F.broadcast(part), part_key, "inner")
    pseudo_part = ev_shape(
        pseudo_part, F.lit(OP_ROW_DELETE), F.col("_pts"), with_values=False
    )

    parts = [evs, pseudo_part]
    if range_tombs is not None:
        from .tombstones import clustering_in_range

        rt = range_tombs.select(
            *[F.col(c).alias(f"_r_{c}") for c in part_key],
            F.struct("lo", "lo_incl", "hi", "hi_incl").alias("_rng"),
            F.col("ts").alias("_rts"),
        )
        cond = [F.col(c) == F.col(f"_r_{c}") for c in part_key]
        on = cond[0]
        for c in cond[1:]:
            on = on & c
        pseudo_rt = keys.join(
            F.broadcast(rt),
            on
            & clustering_in_range(
                [F.col(c) for c in table.clustering_key], F.col("_rng")
            ),
            "inner",
        )
        parts.append(
            ev_shape(pseudo_rt, F.lit(OP_ROW_DELETE), F.col("_rts"), with_values=False)
        )

    # seed: target rows for those keys, cells as stored (value, _ts)
    seed_src = target_physical.join(keys, pk, "left_semi")
    seed_cols = [
        *[F.col(c) for c in pk],
        F.lit(OP_SEED).alias("op"),
        F.lit(-2).cast("long").alias("ts"),  # sorts before all events
    ]
    for c in value_cols:
        if c in target_physical.columns:
            seed_cols += [
                F.col(c),
                F.lit(False).alias("d_" + c),
                F.col(ts_col(c)).cast("string").alias("sts_" + c),
            ]
        else:
            seed_cols += [
                F.lit(None).cast("string").alias(c),
                F.lit(False).alias("d_" + c),
                F.lit(None).cast("string").alias("sts_" + c),
            ]
    for c in coll_cols:
        seed_cols += [
            F.lit(None).cast("string").alias("m_" + c),
            F.lit(False).alias("dm_" + c),
            F.lit(None).cast("string").alias("de_" + c),
        ]
        if c in target_physical.columns:
            # stored element cells {k: {v, ts, ttl}} + collection tombstone
            seed_cols += [
                F.to_json(F.col(c)).alias("sm_" + c),
                F.col(ctomb_col(c)).cast("string").alias("sct_" + c),
            ]
        else:
            seed_cols += [
                F.lit(None).cast("string").alias("sm_" + c),
                F.lit(None).cast("string").alias("sct_" + c),
            ]
    seed_cols += [
        F.col(COL_MARKER_TS).cast("string").alias("seed_marker"),
        F.col(COL_TOMB_TS).cast("string").alias("seed_tomb"),
    ]
    parts.append(seed_src.select(*seed_cols))

    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)

    out_schema = (
        ", ".join(f"`{c}` string" for c in pk)
        + ", ts long, col string, expected string, actual string"
    )
    vcols = list(value_cols)
    ccols = list(coll_cols)

    def _isnull(x) -> bool:
        return x is None or (isinstance(x, float) and pd.isna(x))

    def _as_int(x):
        """Nullable int64s transit the Arrow boundary as STRINGS: pandas
        would coerce a nullable long column to float64, which cannot
        represent full-precision CDC timestamps (~2^61) — a collection
        tombstone at ts-1 would round onto its own statement's cells."""
        return None if _isnull(x) else int(x)

    def _check(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts", kind="mergesort")
        cells: dict[str, tuple] = {}
        ccells: dict[str, dict] = {c: {} for c in ccols}  # c -> {k: (v, ts)}
        ctombs: dict[str, int] = {c: NEG_INF for c in ccols}
        marker = NEG_INF
        tomb = NEG_INF
        mismatches = []
        for row in pdf.itertuples(index=False):
            r = row._asdict() if hasattr(row, "_asdict") else dict(zip(pdf.columns, row))
            op, ts = int(r["op"]), int(r["ts"])
            if op == OP_SEED:
                for c in vcols:
                    sts = _as_int(r["sts_" + c])
                    if sts is not None:
                        cells[c] = (r[c] if not pd.isna(r[c]) else None, sts)
                for c in ccols:
                    sm = r["sm_" + c]
                    if not _isnull(sm):
                        for k, cell in json.loads(sm).items():
                            ccells[c][k] = (cell.get("v"), int(cell["ts"]))
                    sct = _as_int(r["sct_" + c])
                    if sct is not None:
                        ctombs[c] = max(ctombs[c], sct)
                sm_marker = _as_int(r["seed_marker"])
                if sm_marker is not None:
                    marker = max(marker, sm_marker)
                sm_tomb = _as_int(r["seed_tomb"])
                if sm_tomb is not None:
                    tomb = max(tomb, sm_tomb)
            elif op == OP_PREIMAGE:
                # visible state now vs asserted state
                vis_maps = {}
                for c in ccols:
                    eff = max(tomb, ctombs[c])
                    vis_maps[c] = {
                        k: v
                        for k, (v, cts) in ccells[c].items()
                        if v is not None and cts > eff
                    }
                live = (
                    marker > tomb
                    or any(v is not None and cts > tomb for v, cts in cells.values())
                    or any(vis_maps[c] for c in ccols)
                )
                for c in vcols:
                    v, cts = cells.get(c, (None, NEG_INF))
                    actual = v if (live and v is not None and cts > tomb) else None
                    expected = r[c] if not pd.isna(r[c]) else None
                    if actual != expected:
                        mismatches.append(
                            tuple(r[k] for k in pk) + (ts, c, expected, actual)
                        )
                for c in ccols:
                    actual = _canon_map(vis_maps[c] if live else None)
                    asserted = r["m_" + c]
                    expected = (
                        _canon_map(json.loads(asserted))
                        if not _isnull(asserted)
                        else None
                    )
                    if actual != expected:
                        mismatches.append(
                            tuple(r[k] for k in pk) + (ts, c, expected, actual)
                        )
            elif op == OP_ROW_DELETE:
                tomb = max(tomb, ts)
            else:  # UPDATE / INSERT
                for c in vcols:
                    v = r[c] if not pd.isna(r[c]) else None
                    written = v is not None or bool(r["d_" + c])
                    if written:
                        old = cells.get(c)
                        if old is None or ts > old[1]:
                            cells[c] = (None if bool(r["d_" + c]) else v, ts)
                for c in ccols:
                    if bool(r["dm_" + c]):
                        # whole-map overwrite: collection tombstone at
                        # ts-1 (the same statement's elements survive)
                        ctombs[c] = max(ctombs[c], ts - 1)
                    m = r["m_" + c]
                    if not _isnull(m):
                        for k, v in json.loads(m).items():
                            old = ccells[c].get(k)
                            if old is None or ts > old[1]:
                                ccells[c][k] = (v, ts)
                    de = r["de_" + c]
                    if not _isnull(de):
                        for k in json.loads(de):
                            old = ccells[c].get(k)
                            if old is None or ts > old[1]:
                                ccells[c][k] = (None, ts)
                if op == OP_ROW_INSERT:
                    marker = max(marker, ts)
        return pd.DataFrame(
            mismatches, columns=pk + ["ts", "col", "expected", "actual"]
        )

    return union, _check, out_schema, pk
