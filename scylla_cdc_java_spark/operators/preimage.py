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

Scope: scalar value columns only — preimage rows for collection columns
are not compared (the reference's checkPreimage walks the row's column
definitions the same way but our generator never emits collection
preimages; extending the seed/replay state to element maps is the
natural extension point).
"""

from __future__ import annotations

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
    deleted_col,
    ts_col,
)

OP_SEED = -1
NEG_INF = -1


def check_preimages(
    batch_df: DataFrame,
    target_physical: DataFrame,
    table: TableConfig,
    range_tombs: DataFrame | None = None,
) -> DataFrame:
    """batch_df: normalized log slice (has cdc$ts). target_physical: the
    sink's stored rows (previous batches folded). range_tombs: closed
    ranges of this batch (from fold_batch), for before-state accuracy."""
    pk = list(table.primary_key)
    repo_col = table.partition_key[0]
    path_col = table.clustering_key[0]
    value_cols = [
        c for c in table.value_columns if c in batch_df.columns
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
            cols += [F.lit(None).cast("long").alias("sts_" + c)]
        cols += [
            F.lit(None).cast("long").alias("seed_marker"),
            F.lit(None).cast("long").alias("seed_tomb"),
        ]
        return df.select(*cols)

    # batch write/delete/preimage events for preimage keys only
    evs = batch_df.where(
        F.col(COL_OP).isin([OP_ROW_UPDATE, OP_ROW_INSERT, OP_ROW_DELETE, OP_PREIMAGE])
    ).join(keys, pk, "left_semi")
    evs = ev_shape(evs, F.col(COL_OP), F.col(COL_TS), with_values=True)

    # partition deletes -> pseudo row-deletes for every preimage key of
    # that repo (broadcast: op-4 rows are rare)
    # every op-4 event individually: a preimage between two partition
    # deletes of the same repo must see only the earlier one
    part = (
        batch_df.where(F.col(COL_OP) == OP_PARTITION_DELETE)
        .select(repo_col, F.col(COL_TS).alias("_pts"))
        .distinct()
    )
    pseudo_part = keys.join(F.broadcast(part), repo_col, "inner")
    pseudo_part = ev_shape(
        pseudo_part, F.lit(OP_ROW_DELETE), F.col("_pts"), with_values=False
    )

    parts = [evs, pseudo_part]
    if range_tombs is not None:
        from .tombstones import clustering_in_range

        rt = range_tombs.select(
            F.col(repo_col).alias("_r_repo"),
            F.struct("lo", "lo_incl", "hi", "hi_incl").alias("_rng"),
            F.col("ts").alias("_rts"),
        )
        pseudo_rt = keys.join(
            F.broadcast(rt),
            (F.col(repo_col) == F.col("_r_repo"))
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
                F.col(ts_col(c)).alias("sts_" + c),
            ]
        else:
            seed_cols += [
                F.lit(None).cast("string").alias(c),
                F.lit(False).alias("d_" + c),
                F.lit(None).cast("long").alias("sts_" + c),
            ]
    seed_cols += [
        F.col(COL_MARKER_TS).alias("seed_marker"),
        F.col(COL_TOMB_TS).alias("seed_tomb"),
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

    def _check(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts", kind="mergesort")
        cells: dict[str, tuple] = {}
        marker = NEG_INF
        tomb = NEG_INF
        mismatches = []
        repo = pdf.iloc[0]["repo"] if "repo" in pdf.columns else None
        for row in pdf.itertuples(index=False):
            r = row._asdict() if hasattr(row, "_asdict") else dict(zip(pdf.columns, row))
            op, ts = int(r["op"]), int(r["ts"])
            if op == OP_SEED:
                for c in vcols:
                    sts = r["sts_" + c]
                    if sts is not None and not pd.isna(sts):
                        cells[c] = (r[c] if not pd.isna(r[c]) else None, int(sts))
                if r["seed_marker"] is not None and not pd.isna(r["seed_marker"]):
                    marker = max(marker, int(r["seed_marker"]))
                if r["seed_tomb"] is not None and not pd.isna(r["seed_tomb"]):
                    tomb = max(tomb, int(r["seed_tomb"]))
            elif op == OP_PREIMAGE:
                # visible state now vs asserted state
                live = marker > tomb or any(
                    v is not None and cts > tomb for v, cts in cells.values()
                )
                for c in vcols:
                    v, cts = cells.get(c, (None, NEG_INF))
                    actual = v if (live and v is not None and cts > tomb) else None
                    expected = r[c] if not pd.isna(r[c]) else None
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
                if op == OP_ROW_INSERT:
                    marker = max(marker, ts)
        return pd.DataFrame(
            mismatches, columns=pk + ["ts", "col", "expected", "actual"]
        )

    return union.groupBy(*pk).applyInPandas(_check, schema=out_schema)
