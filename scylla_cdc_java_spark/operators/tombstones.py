"""Range-delete pairing — re-creation of the replicator's per-stream
RangeTombstoneState (reference: scylla-cdc-replicator Main.java:368-463,
491-531).

The reference stashes a range-delete *start* bound (op 5 inclusive / 6
exclusive) per stream id and, on the matching *end* row (op 7 inclusive /
8 exclusive), emits one ranged DELETE whose timestamp is the END row's
``cdc$time``. Pairs never interleave within a stream (CDC log writes them
adjacently, same batch), so pairing is: sort a stream's range rows by
time, zip starts with the next end.

Spark mapping: range ops are a tiny fraction of the log, so we filter
them out (cheap, pushed-down predicate) and run a ``lag()`` window per
stream — the window only sees range rows, never the bulk of the batch.
A start with no following end inside the batch is *carryover* state for
the checkpoint (the reference holds it in memory across fetch windows);
the next batch injects it back as a synthetic start row.

Multi-column clustering keys: the reference prepares a ranged DELETE for
every clustering-prefix length x inclusivity combination
(Main.java:394-416) — a bound is a PREFIX of the clustering key. Bounds
here are therefore ``array<string>`` values aligned with
``table.clustering_key`` with NULLs after the prefix; comparison is
prefix-lexicographic (``clustering_in_range``) exactly like CQL's
multi-column relations restricted to the bound's prefix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..model import (
    COL_OP,
    COL_STREAM_ID,
    COL_TS,
    RANGE_END_OPS,
    RANGE_START_OPS,
    OP_RANGE_DELETE_END_INCLUSIVE,
    OP_RANGE_DELETE_START_INCLUSIVE,
    TableConfig,
)


def clustering_in_range(row_cols: list[Column], r) -> Column:
    """True iff the row's clustering tuple falls inside range-struct
    ``r`` (fields: lo array, lo_incl, hi array, hi_incl). Bounds compare
    on their non-NULL prefix only — a length-L bound covers every row
    sharing the compared relation on the first L components (the
    reference's per-prefix-length prepared DELETEs, Main.java:394-416)."""
    n = len(row_cols)

    def _side(bound, incl, strict_op):
        eq = F.lit(True)
        strict = F.lit(False)
        for i in range(n):
            bi = F.element_at(bound, i + 1)
            strict = strict | (eq & bi.isNotNull() & strict_op(row_cols[i], bi))
            eq = eq & (bi.isNull() | (row_cols[i] == bi))
        return strict | (eq & incl)

    above = _side(r["lo"], r["lo_incl"], lambda a, b: a > b)
    below = _side(r["hi"], r["hi_incl"], lambda a, b: a < b)
    return above & below


def _bound_array(table: TableConfig) -> Column:
    return F.array(*[F.col(c) for c in table.clustering_key])


def pair_range_bounds(
    range_df: DataFrame, table: TableConfig
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """range_df: only ops 5-8, columns [stream_id, ts, op, part_key...,
    clustering cols]. Returns (closed_ranges, pending_starts,
    pending_ends) — bounds as clustering-prefix arrays.

    pending_ends exist only under out-of-order *batch* delivery (the
    Structured Streaming file source may hand a later file first): an
    END whose START has not arrived yet is carried over and paired when
    the START shows up — the mirror image of the reference's
    start-carryover (Main.java:491-531), which only needs one direction
    because its windows are chronological."""
    part_key = list(table.partition_key)

    w = Window.partitionBy(COL_STREAM_ID).orderBy(COL_TS)
    paired = (
        range_df.select(
            COL_STREAM_ID, COL_TS, COL_OP, *part_key,
            _bound_array(table).alias("_bound"),
        )
        .withColumn("_prev_op", F.lag(COL_OP).over(w))
        .withColumn("_prev_bound", F.lag("_bound").over(w))
        .withColumn("_next_op", F.lead(COL_OP).over(w))
    )
    closed = (
        paired.where(
            F.col(COL_OP).isin(list(RANGE_END_OPS))
            & F.col("_prev_op").isin(list(RANGE_START_OPS))
        )
        .select(
            *part_key,
            F.col("_prev_bound").alias("lo"),
            (F.col("_prev_op") == OP_RANGE_DELETE_START_INCLUSIVE).alias("lo_incl"),
            F.col("_bound").alias("hi"),
            (F.col(COL_OP) == OP_RANGE_DELETE_END_INCLUSIVE).alias("hi_incl"),
            F.col(COL_TS).alias("ts"),
        )
    )
    pending = (
        # A start is pending when nothing follows it in the batch, OR
        # when the next range row of its stream is ANOTHER start (its
        # own end is delayed to a later out-of-order batch: delivery
        # START1, START2, END2 must carry START1, not drop it).
        paired.where(
            F.col(COL_OP).isin(list(RANGE_START_OPS))
            & (
                F.col("_next_op").isNull()
                | F.col("_next_op").isin(list(RANGE_START_OPS))
            )
        )
        .select(
            COL_STREAM_ID,
            *part_key,
            F.col("_bound").alias("lo"),
            (F.col(COL_OP) == OP_RANGE_DELETE_START_INCLUSIVE).alias("lo_incl"),
            F.col(COL_TS).alias("ts"),
        )
    )
    pending_ends = (
        paired.where(
            F.col(COL_OP).isin(list(RANGE_END_OPS))
            & (
                F.col("_prev_op").isNull()
                | F.col("_prev_op").isin(list(RANGE_END_OPS))
            )
        )
        .select(
            COL_STREAM_ID,
            *part_key,
            F.col("_bound").alias("hi"),
            (F.col(COL_OP) == OP_RANGE_DELETE_END_INCLUSIVE).alias("hi_incl"),
            F.col(COL_TS).alias("ts"),
        )
    )
    return closed, pending, pending_ends


def extract_range_tombstones(
    log_df: DataFrame,
    table: TableConfig,
    pending_range_starts: list[dict],
    pending_range_ends: list[dict] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Filter ops 5-8 out of a normalized batch, inject checkpointed
    pending starts (and, for out-of-order streaming delivery, pending
    ends), pair, and split closed ranges from new carryover."""
    cks = list(table.clustering_key)
    part_key = list(table.partition_key)
    cols = [COL_STREAM_ID, COL_TS, COL_OP, *part_key, *cks]
    range_df = log_df.where(
        F.col(COL_OP).isin(list(RANGE_START_OPS) + list(RANGE_END_OPS))
    ).select(*cols)

    def _ck_values(bound) -> list:
        # checkpointed bounds are lists aligned to the clustering key;
        # tolerate legacy scalar bounds (single-ck checkpoints)
        vals = list(bound) if isinstance(bound, (list, tuple)) else [bound]
        return vals + [None] * (len(cks) - len(vals))

    inj_rows = [
        (
            p["stream_id"],
            int(p["ts"]),
            int(
                OP_RANGE_DELETE_START_INCLUSIVE
                if p["lo_incl"]
                else OP_RANGE_DELETE_START_INCLUSIVE + 1
            ),
            *[p[k] for k in part_key],
            *_ck_values(p["lo"]),
        )
        for p in pending_range_starts
    ] + [
        (
            p["stream_id"],
            int(p["ts"]),
            int(
                OP_RANGE_DELETE_END_INCLUSIVE
                if p["hi_incl"]
                else OP_RANGE_DELETE_END_INCLUSIVE + 1
            ),
            *[p[k] for k in part_key],
            *_ck_values(p["hi"]),
        )
        for p in (pending_range_ends or [])
    ]
    if inj_rows:
        schema_ddl = (
            f"`{COL_STREAM_ID}` binary, `{COL_TS}` long, `{COL_OP}` tinyint, "
            + ", ".join(f"`{k}` string" for k in part_key)
            + ", "
            + ", ".join(f"`{c}` string" for c in cks)
        )
        inj = log_df.sparkSession.createDataFrame(inj_rows, schema=schema_ddl)
        range_df = inj.unionByName(range_df)

    return pair_range_bounds(range_df, table)
