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

Single clustering column (``path``) is assumed, matching the BASELINE
table; the reference generalizes to PK prefixes of any length
(Main.java:394-416) — a multi-column clustering key would use a struct
bound here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

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


def pair_range_bounds(
    range_df: DataFrame, table: TableConfig
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """range_df: only ops 5-8, columns [stream_id, ts, op, part_key...,
    clustering col]. Returns (closed_ranges, pending_starts,
    pending_ends).

    pending_ends exist only under out-of-order *batch* delivery (the
    Structured Streaming file source may hand a later file first): an
    END whose START has not arrived yet is carried over and paired when
    the START shows up — the mirror image of the reference's
    start-carryover (Main.java:491-531), which only needs one direction
    because its windows are chronological."""
    ck = table.clustering_key[0]
    part_key = list(table.partition_key)

    w = Window.partitionBy(COL_STREAM_ID).orderBy(COL_TS)
    paired = (
        range_df.select(COL_STREAM_ID, COL_TS, COL_OP, *part_key, ck)
        .withColumn("_prev_op", F.lag(COL_OP).over(w))
        .withColumn("_prev_bound", F.lag(ck).over(w))
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
            F.col(ck).alias("hi"),
            (F.col(COL_OP) == OP_RANGE_DELETE_END_INCLUSIVE).alias("hi_incl"),
            F.col(COL_TS).alias("ts"),
        )
    )
    pending = (
        paired.where(
            F.col(COL_OP).isin(list(RANGE_START_OPS)) & F.col("_next_op").isNull()
        )
        .select(
            COL_STREAM_ID,
            *part_key,
            F.col(ck).alias("lo"),
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
            F.col(ck).alias("hi"),
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
    ck = table.clustering_key[0]
    part_key = list(table.partition_key)
    cols = [COL_STREAM_ID, COL_TS, COL_OP, *part_key, ck]
    range_df = log_df.where(
        F.col(COL_OP).isin(list(RANGE_START_OPS) + list(RANGE_END_OPS))
    ).select(*cols)

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
            p["lo"],
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
            p["hi"],
        )
        for p in (pending_range_ends or [])
    ]
    if inj_rows:
        schema_ddl = (
            f"`{COL_STREAM_ID}` binary, `{COL_TS}` long, `{COL_OP}` tinyint, "
            + ", ".join(f"`{k}` string" for k in part_key)
            + f", `{ck}` string"
        )
        inj = log_df.sparkSession.createDataFrame(inj_rows, schema=schema_ddl)
        range_df = inj.unionByName(range_df)

    return pair_range_bounds(range_df, table)
