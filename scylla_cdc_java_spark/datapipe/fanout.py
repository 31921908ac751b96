"""Scan fan-out: fix under-parallel inputs before per-row-heavy work.

A small corpus often arrives as ONE parquet file with ONE row group —
Spark's byte-range file splitting cannot split a single row group, so
every expression upstream of the first exchange runs on a single task
no matter how many cores the session has (measured on the bench host:
the 50k-doc MinHash pipeline spent 6.7 s of its 16.4 s in one task's
interpreted shingle evaluation). ``fan_out`` round-robin-repartitions
such inputs up to the session's core budget; inputs that already carry
enough partitions (the 100 TB case: thousands of files) pass through
untouched, so this never adds a shuffle where the scan is already
parallel.

Callers pass the table's unique id column(s): hash repartitioning on
a key is deterministic AND avoids the local sort a keyless round-robin
``repartition(n)`` performs first (``sortBeforeRepartition`` — needed
there so retried tasks reproduce the same row placement; measured to
cost more than the fan-out won back on 1M-row inputs). A unique id
spreads near-uniformly, so one partition per core suffices (over-
splitting a small input into multiple task waves measured strictly
worse). Without ``cols`` the round-robin fallback is used.

Repartitioning is row-preserving, so any aggregate/join/window
downstream computes the same RESULT; only partial-aggregation grouping
changes. Callers whose results are sensitive to floating-point
accumulation ORDER (e.g. ``sum`` over doubles) must not fan out —
every use in this package is order-insensitive (min/max/count/hash
aggregates, per-row projections, window functions with explicit
ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fan_out(df: DataFrame, *cols: str,
            min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` over the session's core budget when its
    current plan yields fewer partitions; no-op otherwise. ``cols``:
    unique-id column(s) to hash-partition by (preferred); keyless
    round-robin when omitted."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:
        return df
    if cur >= target:
        return df
    if cols:
        return df.repartition(target, *[F.col(c) for c in cols])
    return df.repartition(target)
