"""Feed-driven incremental aggregate — a continuously-maintained
rollup (materialized view) over the CDC-maintained table, updated
ONLY from the change feed.

``ParquetMirror`` materializes the table itself; this consumer
materializes a GROUP-BY over it. The key property that makes it
O(changed) per sync instead of O(table): for additive aggregates
(row counts and SUMs of row-local expressions), the net change feed
is a complete delta stream — each feed row contributes
``sign * expr(image)`` where sign is +1 for ``insert`` /
``update_postimage`` and -1 for ``delete`` / ``update_preimage``.
An update that moves a row between groups emits -1 to the old group
and +1 to the new one through its pre/post images; a delete drains
its group; a group whose net row count reaches zero vanishes. The
reference has no counterpart (its destination is a live Scylla
table; rollups would be re-queried) — this is the Flink/Materialize
"incremental view maintenance over a changelog" shape expressed on
lake snapshots.

Unlike the mirror, the aggregate apply is NOT idempotent: adding a
span's deltas twice double-counts it. At-least-once redelivery is
therefore handled structurally, the same way the sink's sharded
bucket index handles commits:

- each ``sync()`` writes the span's per-group partial sums as ONE
  immutable **delta file** (``deltas/d{version}.parquet``, O(touched
  groups) rows);
- the cursor commit records the authoritative state — base version +
  the list of live delta versions — ATOMICALLY with the position, in
  the cursor's ``extra`` payload. A delta file not named there does
  not exist as far as ``read()`` is concerned;
- a crash between the delta write and the commit leaves an ORPHAN
  file: the next sync re-polls a strict-superset span from the still-
  committed position and writes its own delta; the orphan is never
  read and is reaped once superseded (its version <= the committed
  position without being referenced);
- every ``fold_every`` syncs the base + live deltas fold into a new
  versioned base (``base/v{N}``), committed the same way — read cost
  stays bounded at O(groups) + ``fold_every`` small files.

Exactness: integer metrics (counts, sums of int expressions) are
exact under any interleaving of inserts/updates/deletes — subtraction
is the true inverse. Float metrics accumulate the usual
floating-point reordering noise and, under churn, cancellation
residue; use them for monitoring, not reconciliation.

Scale posture: the per-sync Spark work is one partial-aggregate job
over the span's feed rows (map-side combine, shuffle on the group
key, O(touched groups) output); the fold is a union of <= fold_every
delta files + the base, re-aggregated — amortized O(groups)/
fold_every per sync. Nothing ever scans the source table. Like the
incremental indexes, the aggregate state is a derived, rebuildable
cache with a single maintainer per path; cross-process readers
needing snapshot isolation should query the sink.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, functions as F

from .bucket_index import atomic_write_json
from .changefeed import (
    CHANGE_TYPE_COL,
    CT_INSERT,
    CT_UPDATE_POST,
    ChangeFeedCursor,
)

#: implicit metric: net row count per group (the group-liveness gate)
ROWS_COL = "rows"


class FeedAggregate:
    """Incrementally-maintained ``GROUP BY`` over a sink table; see
    module docstring for the design.

    ``group_by`` maps output column name -> row-local SQL expression
    (evaluated against a row image: pk + value/collection columns);
    ``metrics`` maps output name -> numeric row-local SQL expression,
    maintained as ``SUM(expr)``. A net row count is always maintained
    as ``rows``. Expressions must be deterministic and may only
    reference columns present from the first consumed span (a column
    added later by schema evolution is NULL-filled backwards by the
    feed, but cannot be referenced before it first exists).
    """

    def __init__(self, spark, path: str,
                 group_by: dict[str, str],
                 metrics: dict[str, str] | None = None,
                 lease_ttl_s: float = 3600.0,
                 fold_every: int = 8):
        if ROWS_COL in group_by or ROWS_COL in (metrics or {}):
            raise ValueError(f"'{ROWS_COL}' is reserved for the "
                             "implicit row-count metric")
        overlap = set(group_by) & set(metrics or {})
        if overlap:
            raise ValueError(f"column names used as both group and "
                             f"metric: {sorted(overlap)}")
        self.spark = spark
        self.path = path
        self.group_by = dict(group_by)
        self.metrics = dict(metrics or {})
        self.lease_ttl_s = lease_ttl_s
        self.fold_every = int(fold_every)
        os.makedirs(path, exist_ok=True)
        self._check_spec()

    def _check_spec(self) -> None:
        """Pin the (group_by, metrics) spec to the state path on first
        use and REFUSE a mismatching spec afterwards: delta files are
        partial sums under one spec — mixing two specs' deltas in one
        state dir would silently produce garbage, and a changed spec
        invalidates every stored partial (rebuild under a new path, or
        delete the state dir to re-bootstrap)."""
        spec = {"group_by": self.group_by, "metrics": self.metrics}
        spec_path = os.path.join(self.path, "_spec.json")
        if os.path.exists(spec_path):
            with open(spec_path) as f:
                stored = json.load(f)
            if stored != spec:
                raise ValueError(
                    f"aggregate spec mismatch at {self.path}: stored "
                    f"{stored}, requested {spec}; deltas are partial "
                    "sums under one spec — use a new state path (or "
                    "delete this one to re-bootstrap)")
            return
        atomic_write_json(spec_path, spec)

    # -- layout ------------------------------------------------------
    @property
    def _cursor_path(self) -> str:
        return os.path.join(self.path, "_cursor.json")

    @property
    def _schema_path(self) -> str:
        return os.path.join(self.path, "_schema.json")

    def _delta_path(self, version: int) -> str:
        return os.path.join(self.path, "deltas", f"d{int(version)}.parquet")

    def _base_path(self, version: int) -> str:
        return os.path.join(self.path, "base", f"v{int(version)}")

    # -- state -------------------------------------------------------
    def position(self) -> int | None:
        return ChangeFeedCursor(None, self._cursor_path).position()

    def _committed(self) -> dict:
        """The authoritative state: ``{"base": int|None,
        "deltas": [int, ...]}`` — whatever the last cursor commit
        recorded (empty-state defaults before the first commit)."""
        extra = ChangeFeedCursor(None, self._cursor_path).extra()
        return extra if extra else {"base": None, "deltas": []}

    def _out_schema(self):
        if not os.path.exists(self._schema_path):
            return None
        from pyspark.sql.types import StructType

        with open(self._schema_path) as f:
            return StructType.fromJson(json.loads(json.load(f)["ddl"]))

    # -- the additive delta ------------------------------------------
    def _span_delta(self, feed: DataFrame) -> DataFrame:
        """Per-group signed partial sums for one feed span. The
        bootstrap feed (whole snapshot as inserts) flows through the
        same expression — every row signs +1."""
        sign = F.when(
            F.col(CHANGE_TYPE_COL).isin(CT_INSERT, CT_UPDATE_POST),
            F.lit(1),
        ).otherwise(F.lit(-1))
        rows = feed.select(
            *[F.expr(e).alias(n) for n, e in self.group_by.items()],
            sign.alias("__sign"),
            *[F.expr(expr).alias(f"__m_{n}")
              for n, expr in self.metrics.items()],
        )
        return rows.groupBy(*self.group_by).agg(
            F.sum("__sign").cast("long").alias(ROWS_COL),
            *[F.sum(F.col("__sign") * F.col(f"__m_{n}")).alias(n)
              for n in self.metrics],
        )

    def _parts(self, state: dict) -> list[str]:
        parts = []
        if state["base"] is not None:
            parts.append(self._base_path(state["base"]))
        parts.extend(self._delta_path(v) for v in state["deltas"])
        return parts

    def _resolve(self, state: dict) -> DataFrame:
        """Fold a committed state (base + live deltas) into the
        current aggregate: re-sum the partials, drop net-empty
        groups. Every summed column is cast back to its pinned delta
        type — SUM widens some types (decimal precision), and a fold
        that persisted the widened type would make the base unreadable
        under the pinned schema on the next resolve."""
        schema = self._out_schema()
        parts = self._parts(state)
        if not parts:
            if schema is None:
                raise FileNotFoundError(
                    f"no aggregate state at {self.path}; run sync() first")
            return self.spark.createDataFrame([], schema=schema)
        if schema is None:
            raise FileNotFoundError(
                f"aggregate state at {self.path} has delta/base files "
                "but no _schema.json (registry lost or partially "
                "restored); delete the state dir to re-bootstrap")
        types = {f.name: f.dataType for f in schema.fields}
        df = self.spark.read.schema(schema).parquet(*parts)
        return (
            df.groupBy(*self.group_by)
            .agg(F.sum(ROWS_COL).cast("long").alias(ROWS_COL),
                 *[F.sum(n).cast(types[n]).alias(n)
                   for n in self.metrics])
            .where(F.col(ROWS_COL) != 0)
        )

    def read(self) -> DataFrame:
        """The maintained aggregate as of the last committed sync:
        one row per live group — group columns, ``rows``, then each
        metric's running SUM."""
        return self._resolve(self._committed())

    # -- maintenance ---------------------------------------------------
    def sync(self, sink) -> dict:
        """One consumption step: poll the cursor's feed span, write
        its delta file, commit position + delta list atomically, fold
        when due, then reap superseded/orphaned files. Retry posture
        mirrors ``ParquetMirror.sync`` — the cursor commits last, so
        a vacuumed-head race anywhere before it is safely retried
        (shared classifier — ``changefeed.retry_transient_reads``)."""
        from .changefeed import retry_transient_reads

        return retry_transient_reads(
            lambda: self._sync_once(sink), self.position)

    def _sync_once(self, sink) -> dict:
        import time as _time

        t0 = _time.time()
        cur = ChangeFeedCursor(sink, self._cursor_path,
                               lease_ttl_s=self.lease_ttl_s)
        pos = cur.position()
        feed, tok = cur.poll()
        if feed is None:
            return {"version": tok["version"],
                    "table_version": tok["version"],
                    "changed": [], "removed": [], "folded": False,
                    "sync_s": _time.time() - t0}
        # the span's changed-bucket set (driver-side metadata only) —
        # reported for touch-scoping observability and to share the
        # maintainer-tool interface with the incremental indexes; the
        # feed itself prunes to these buckets internally
        from .changefeed import changed_buckets

        if pos is None:
            changed = sorted(
                int(b)
                for b in sink._load_root(tok["version"])["bucket_index"]
            )
        else:
            changed = changed_buckets(sink, pos, tok["version"])
        state = self._committed()
        delta = self._span_delta(feed)
        dpath = self._delta_path(tok["version"])
        # overwrite: a crashed earlier attempt at this same head left
        # an orphan here; it was never committed, so replacing it is
        # the recovery. The Observation rides the write job so a
        # zero-group span is detected without a second action.
        from pyspark.sql import Observation

        obs = Observation()
        (
            delta.observe(obs, F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite").parquet(dpath)
        )
        # persist the output schema before the commit (needed to read
        # empty states and to union files without footer scans); a
        # crash in between leaves a newer schema file with the old
        # state, which the redelivered span re-confirms — the schema
        # is a function of the (group_by, metrics) spec, not the data
        self._save_schema(delta.schema)
        if int(obs.get["n"]) == 0:
            # value-neutral span (compaction/vacuum-only commits):
            # advance the position but do NOT append the empty delta —
            # an idle-but-compacting table must not creep toward a
            # pointless full-base fold every fold_every such spans.
            # The empty file is unreferenced and <= the committed
            # position, so the GC below reaps it.
            cur.commit(tok, extra=state)
            self._gc(state, tok["version"])
            return {"version": tok["version"],
                    "table_version": tok["version"],
                    "changed": changed, "removed": [], "folded": False,
                    "sync_s": _time.time() - t0}
        new_state = {"base": state["base"],
                     "deltas": state["deltas"] + [tok["version"]]}
        folded = False
        if len(new_state["deltas"]) >= self.fold_every:
            bpath = self._base_path(tok["version"])
            folded_df = self._resolve(new_state)
            folded_df.write.mode("overwrite").parquet(bpath)
            new_state = {"base": tok["version"], "deltas": []}
            folded = True
        cur.commit(tok, extra=new_state)
        self._gc(new_state, tok["version"])
        return {"version": tok["version"],
                "table_version": tok["version"],
                "changed": changed, "removed": [], "folded": folded,
                "sync_s": _time.time() - t0}

    def _save_schema(self, schema) -> None:
        atomic_write_json(self._schema_path, {"ddl": schema.json()})

    def _gc(self, state: dict, committed: int) -> None:
        """Reap superseded bases and delta files that are (a) not
        referenced by the committed state and (b) not newer than the
        committed position — (b) spares a concurrent writer's
        in-flight file, though the documented contract is one
        maintainer per path. Best-effort: a surviving orphan is
        invisible (never referenced) and re-eligible next sync."""
        live = {os.path.abspath(p) for p in self._parts(state)}
        for sub, pat in (("deltas", "d"), ("base", "v")):
            d = os.path.join(self.path, sub)
            if not os.path.isdir(d):
                continue
            for name in os.listdir(d):
                if not name.startswith(pat):
                    continue
                stem = name[len(pat):].removesuffix(".parquet")
                try:
                    v = int(stem)
                except ValueError:
                    continue
                full = os.path.abspath(os.path.join(d, name))
                if full not in live and v <= committed:
                    shutil.rmtree(full, ignore_errors=True)


class BucketAggregate:
    """Snapshot-synced incremental GROUP BY supporting NON-INVERTIBLE
    metrics — the rollup family's second member, closing the
    ``FeedAggregate`` design bound stated above: the change feed alone
    cannot maintain MIN/MAX (deleting the current minimum needs the
    runner-up, which no delta stream carries), so this consumer keeps
    per-(bucket, group) PARTIAL aggregates and re-derives only the
    partials of buckets the CDC stream touched — the classic partial-
    aggregation-tree IVM shape (Materialize's reduction hierarchies),
    expressed on the sink's own bucket grain:

    - **state**: bucket-partitioned parquet of per-(bucket, group)
      partials (``rows`` count + one partial per metric), partitioned
      by the sink's ``pmod(xxhash64(pk), num_buckets)`` routing;
    - **sync**: manifest-fingerprint diff (the same free, exact
      change signal every bucket-synced index uses) -> partition-pruned
      rescan of ONLY the changed buckets -> one partial-agg job ->
      dynamic overwrite of exactly those partitions (the maintenance
      core is ``datapipe.incremental._BucketSyncedIndex``, shared with
      the MinHash/SimHash/IVF indexes);
    - **read**: re-reduce the partials on the group key (MIN of MINs,
      MAX of MAXes, SUM of SUMs/counts) — one bounded agg job over
      O(live (bucket, group) pairs) rows, never the table.

    Scale posture: sync is O(changed buckets) scan + a shuffle of
    their group partials; read is O(partial rows) — for low-cardinality
    groups that is ~num_buckets x |groups| tiny rows (metadata scale:
    10^5 buckets x 100 groups = 10^7 partial rows, a trivial agg job),
    and for high-cardinality groups a pk-correlated group lands in ~1
    bucket so partials approach one row per group. Division of labor
    with ``FeedAggregate``: additive metrics can ride the feed with NO
    table rescans at all; MIN/MAX structurally cannot, and the touched-
    bucket rescan is the bounded-cost way to keep them exact under
    deletes and group-moving updates.

    Metric spec: ``{out_col: (fn, row_expr)}`` with ``fn`` in
    {"min", "max", "sum", "approx_distinct"}; a net ``rows`` count is
    always maintained. NULL semantics match SQL (MIN/MAX/SUM skip
    NULLs; an all-NULL group yields NULL; ``approx_distinct`` of an
    all-NULL group is 0, matching ``count(distinct)``). Like
    ``FeedAggregate``, the spec is pinned to the state path on first
    use and a mismatch refuses loudly.

    ``approx_distinct`` is the sketch member of the family: the
    partial is an Apache DataSketches HLL sketch per (bucket, group)
    (``hll_sketch_agg``, a few KB regardless of cardinality), and
    read-time re-reduction is sketch union + estimate
    (``hll_union_agg`` -> ``hll_sketch_estimate``) — distinct counts
    over unbounded-cardinality columns at bounded state, mergeable
    across any partial-aggregation tree. DISTINCT is as non-invertible
    as MIN/MAX (a delete cannot decrement a distinct count without
    knowing whether another live row still carries the value), and the
    sketch additionally cannot "subtract" — the touched-bucket
    re-derivation sidesteps both: a changed bucket's sketch is rebuilt
    from its surviving rows, so deletes are exact at the bucket grain
    and the union over buckets is the standard HLL merge (error ~1.6%
    at the default lgConfigK=12, and EXACT below the sketch's
    coupon-list threshold).

    Crash safety is the maintenance core's: the fingerprint state file
    lands atomically AFTER the partials, so a crash mid-sync redoes
    those buckets (deterministic recompute — idempotent), and a torn
    state file degrades to a full resync. Single maintainer per path,
    same as every derived index; readers needing snapshot isolation
    query the sink."""

    AGG_FNS = ("min", "max", "sum", "approx_distinct")

    def __init__(self, spark, path: str,
                 group_by: dict[str, str],
                 metrics: dict[str, tuple] | None = None):
        from ..datapipe.incremental import _BucketSyncedIndex

        from ..datapipe.incremental import BUCKET_COL

        if ROWS_COL in group_by or ROWS_COL in (metrics or {}):
            raise ValueError(f"'{ROWS_COL}' is reserved for the "
                             "implicit row-count metric")
        if BUCKET_COL in group_by or BUCKET_COL in (metrics or {}):
            raise ValueError(f"'{BUCKET_COL}' is reserved for the "
                             "partials' bucket routing column")
        overlap = set(group_by) & set(metrics or {})
        if overlap:
            raise ValueError(f"column names used as both group and "
                             f"metric: {sorted(overlap)}")
        for n, spec in (metrics or {}).items():
            if (not isinstance(spec, (tuple, list)) or len(spec) != 2
                    or not isinstance(spec[0], str)):
                raise ValueError(
                    f"metric {n!r}: expected (fn, row_expr), got "
                    f"{spec!r} — note FeedAggregate takes a bare expr "
                    "string; this class needs the agg fn too")
            fn = spec[0]
            if fn not in self.AGG_FNS:
                raise ValueError(
                    f"metric {n!r}: unsupported agg fn {fn!r} "
                    f"(supported: {self.AGG_FNS}); invertible-only "
                    "rollups that never rescan the table are "
                    "FeedAggregate's job")
        self.group_by = dict(group_by)
        self.metrics = {n: (str(fn), str(e))
                        for n, (fn, e) in (metrics or {}).items()}

        outer = self

        class _Core(_BucketSyncedIndex):
            data_subdir = "partials"
            # partials sorted by group within each bucket partition:
            # parquet row-group stats prune per-group probes
            sort_cols = tuple(group_by)

            def _derive(self, rows, sink):
                return outer._partials(rows, sink)

        self._core = _Core(spark, path)
        self.spark = spark
        self.path = path
        self._check_spec()

    # -- spec pinning (same contract as FeedAggregate) -----------------
    def _check_spec(self) -> None:
        spec = {"group_by": self.group_by,
                "metrics": {n: list(fe) for n, fe in self.metrics.items()}}
        spec_path = os.path.join(self.path, "_spec.json")
        if os.path.exists(spec_path):
            with open(spec_path) as f:
                stored = json.load(f)
            if stored != spec:
                raise ValueError(
                    f"aggregate spec mismatch at {self.path}: stored "
                    f"{stored}, requested {spec}; partials are only "
                    "meaningful under one spec — use a new state path "
                    "(or delete this one to re-bootstrap)")
            return
        atomic_write_json(spec_path, spec)

    # -- the per-bucket partials ---------------------------------------
    def _partials(self, rows: DataFrame, sink) -> DataFrame:
        from ..datapipe.incremental import BUCKET_COL

        gcols = [F.expr(e).alias(n) for n, e in self.group_by.items()]
        aggs = [F.count(F.lit(1)).cast("long").alias(ROWS_COL)]
        for n, (fn, e) in self.metrics.items():
            if fn == "approx_distinct":
                # partial = an HLL sketch of the bucket's values (NULLs
                # skipped by the sketch agg itself)
                aggs.append(F.hll_sketch_agg(F.expr(e)).alias(n))
            else:
                aggs.append(getattr(F, fn)(F.expr(e)).alias(n))
        return (
            # routing pinned by the maintenance core to the root its
            # fingerprint diff planned against (rebucket safety)
            rows.withColumn(
                BUCKET_COL,
                sink._bucket_expr(getattr(self._core, "_route_nb", None)))
            .groupBy(F.col(BUCKET_COL), *gcols)
            .agg(*aggs)
            .select(*self.group_by, ROWS_COL, *self.metrics, BUCKET_COL)
        )

    # -- maintenance / query ---------------------------------------------
    def sync(self, sink) -> dict:
        """Bring the partials up to date with ``sink``'s committed
        state; O(changed buckets). Same return shape as every
        bucket-synced index (tools/index_maintainer.py compatible)."""
        return self._core.sync(sink)

    def partials(self) -> DataFrame:
        """The raw per-(bucket, group) partials — the maintained state."""
        return self._core.data()

    def read(self) -> DataFrame:
        """The current aggregate: one row per live group — group
        columns, ``rows``, then each metric. Re-reduces the partials;
        SUM's type widening is cast back to the pinned partial type so
        repeated folds can never drift the schema."""
        df = self.partials()
        types = {f.name: f.dataType for f in df.schema.fields}
        aggs = [F.sum(ROWS_COL).cast("long").alias(ROWS_COL)]
        for n, (fn, _e) in self.metrics.items():
            if fn == "approx_distinct":
                # sketch union across buckets, then one estimate; an
                # all-NULL group's empty/absent sketch estimates as 0,
                # matching count(distinct)
                col = F.coalesce(
                    F.hll_sketch_estimate(F.hll_union_agg(F.col(n))),
                    F.lit(0).cast("long"))
            else:
                col = getattr(F, fn)(F.col(n))
                if fn == "sum":
                    col = col.cast(types[n])
            aggs.append(col.alias(n))
        return df.groupBy(*self.group_by).agg(*aggs)
