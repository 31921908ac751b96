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
