"""Pure-Python reference replayer (the golden oracle, SURVEY.md section 5.2).

Applies the reference's consumer semantics row by row, exactly as the
scylla-cdc-java replicator would materialize them on a Scylla target:

- cell-level last-writer-wins: every write carries ``USING TIMESTAMP
  cdc$time`` (replicator Main.java:124-128,269-271) so the cell value with
  the greatest timestamp wins, independent of delivery order;
- three-valued cell semantics (Main.java:143-144): value present -> write;
  NULL + ``cdc$deleted_<col>`` -> write NULL at ts; NULL + no marker ->
  untouched;
- tombstones shadow cells with timestamp <= tombstone timestamp
  (Scylla/Cassandra deletion rule the replicator relies on);
- ROW_INSERT creates a row marker, ROW_UPDATE does not: a row exists iff
  (marker ts > covering tombstone ts) OR it has a live cell;
- PARTITION_DELETE covers every clustering row of the partition key
  (Main.java:348-366); RANGE_DELETE start/end pairs are stashed per stream
  and cover a clustering range at the *end* row's timestamp
  (Main.java:368-463,491-531);
- duplicate delivery is a no-op (same ts, same payload).

State is a dict keyed by (repo, path); tombstone sources are kept
separately so coverage applies to keys never seen in the log slice.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from .model import (
    OP_PARTITION_DELETE,
    OP_POSTIMAGE,
    OP_PREIMAGE,
    OP_RANGE_DELETE_END_EXCLUSIVE,
    OP_RANGE_DELETE_END_INCLUSIVE,
    OP_RANGE_DELETE_START_EXCLUSIVE,
    OP_RANGE_DELETE_START_INCLUSIVE,
    OP_ROW_DELETE,
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
    TableConfig,
    DEFAULT_TABLE,
    pack_time,
)

NEG_INF = -1  # "no tombstone" sentinel (all real ts are >= 0)


def _prefix_cmp(ck: tuple, bound: tuple) -> int:
    """Lexicographic comparison restricted to the bound's non-None
    prefix (the reference prepares a ranged DELETE per clustering-prefix
    length, Main.java:394-416). 0 means the row matches the prefix."""
    for c, b in zip(ck, bound):
        if b is None:
            break
        if c < b:
            return -1
        if c > b:
            return 1
    return 0


def _expired(ts: int, ttl, as_of_ms) -> bool:
    """Scylla expires a cell at write-time + TTL (the replicator re-binds
    the logged TTL on every statement, Main.java:131-138); the lake sink
    applies the same rule at read time given an observation instant."""
    from .model import SEQ_MOD

    return (
        ttl is not None
        and as_of_ms is not None
        and (ts // SEQ_MOD) + ttl * 1000 <= as_of_ms
    )


@dataclass
class OracleState:
    table: TableConfig = DEFAULT_TABLE
    # (repo, path) -> {col: (value_or_None, ts, ttl_or_None)}
    cells: dict = field(default_factory=dict)
    # (repo, path) -> (marker ts, marker ttl) (from INSERT)
    markers: dict = field(default_factory=dict)
    # (repo, path) -> row tombstone ts
    row_tombs: dict = field(default_factory=dict)
    # repo -> partition tombstone ts
    part_tombs: dict = field(default_factory=dict)
    # repo -> list of (lo_tuple, lo_incl, hi_tuple, hi_incl, ts);
    # bounds are clustering-key prefixes (None past the prefix)
    range_tombs: dict = field(default_factory=dict)
    # stream_id -> pending (repo, lo_tuple, inclusive) range start
    pending_range: dict = field(default_factory=dict)
    # non-frozen collections (UnpreparedUpdateOp, Main.java:203-276):
    # (repo, ck) -> {col: {elem_key: (value_or_None, ts, ttl)}}
    coll_cells: dict = field(default_factory=dict)
    # (repo, ck) -> {col: collection tombstone ts} (whole-map overwrite;
    # Cassandra/Scylla write it at ts-1 so the same statement's elements
    # survive it)
    coll_tombs: dict = field(default_factory=dict)

    def _ck(self, path) -> tuple:
        """Normalize a clustering key: scalar (single-column tables) or
        tuple/list aligned with table.clustering_key."""
        if isinstance(path, (tuple, list)):
            return tuple(path)
        return (path,)

    def pk_of(self, ev: dict):
        """Partition-key value of an event: scalar for single-column
        keys (the default table), tuple for COMPOSITE partition keys
        (the reference binds every partition column, Main.java:176-198)."""
        pk = self.table.partition_key
        if len(pk) == 1:
            return ev[pk[0]]
        return tuple(ev.get(c) for c in pk)

    def covering_tomb(self, repo: str, path) -> int:
        ck = self._ck(path)
        t = self.row_tombs.get((repo, ck), NEG_INF)
        t = max(t, self.part_tombs.get(repo, NEG_INF))
        for lo, lo_incl, hi, hi_incl, ts in self.range_tombs.get(repo, ()):
            clo = _prefix_cmp(ck, lo)
            chi = _prefix_cmp(ck, hi)
            lo_ok = clo > 0 or (clo == 0 and lo_incl)
            hi_ok = chi < 0 or (chi == 0 and hi_incl)
            if lo_ok and hi_ok:
                t = max(t, ts)
        return t

    def visible_collection(self, repo: str, ck: tuple, col: str,
                           as_of_ms=None) -> dict | None:
        tomb = self.covering_tomb(repo, ck)
        ctomb = self.coll_tombs.get((repo, ck), {}).get(col, NEG_INF)
        eff = max(tomb, ctomb)
        cells = self.coll_cells.get((repo, ck), {}).get(col, {})
        out = {
            k: v
            for k, (v, ts, ttl) in cells.items()
            if v is not None and ts > eff and not _expired(ts, ttl, as_of_ms)
        }
        return out or None

    def row_live(self, repo: str, path, as_of_ms=None) -> bool:
        ck = self._ck(path)
        tomb = self.covering_tomb(repo, ck)
        mts, mttl = self.markers.get((repo, ck), (NEG_INF, None))
        if mts > tomb and not _expired(mts, mttl, as_of_ms):
            return True
        for v, ts, ttl in self.cells.get((repo, ck), {}).values():
            if v is not None and ts > tomb and not _expired(ts, ttl, as_of_ms):
                return True
        for col in self.table.collection_columns:
            if self.visible_collection(repo, ck, col, as_of_ms):
                return True
        return False

    def visible_row(self, repo: str, path, as_of_ms=None) -> dict | None:
        ck = self._ck(path)
        if not self.row_live(repo, ck, as_of_ms):
            return None
        tomb = self.covering_tomb(repo, ck)
        pk_cols = self.table.partition_key
        out = (
            {pk_cols[0]: repo}
            if len(pk_cols) == 1
            else dict(zip(pk_cols, repo))
        )
        out.update(dict(zip(self.table.clustering_key, ck)))
        cells = self.cells.get((repo, ck), {})
        for c in self.table.value_columns:
            v, ts, ttl = cells.get(c, (None, NEG_INF, None))
            out[c] = (
                v
                if (v is not None and ts > tomb
                    and not _expired(ts, ttl, as_of_ms))
                else None
            )
        for c in self.table.collection_columns:
            out[c] = self.visible_collection(repo, ck, c, as_of_ms)
        return out


def apply_event(st: OracleState, ev: dict) -> None:
    """ev keys: op, ms, seq (or ts), stream_id, repo, path, value columns,
    del_<col> markers."""
    ts = ev.get("ts")
    if ts is None:
        ts = pack_time(ev["ms"], ev["seq"])
    op = ev["op"]
    tbl = st.table
    repo = st.pk_of(ev)  # scalar, or tuple for composite partition keys
    if len(tbl.clustering_key) == 1:
        ck = st._ck(ev.get(tbl.clustering_key[0]))
    else:
        ck = tuple(ev.get(c) for c in tbl.clustering_key)
    key = (repo, ck)

    if op in (OP_ROW_UPDATE, OP_ROW_INSERT, OP_POSTIMAGE):
        ttl = ev.get("ttl")
        cells = st.cells.setdefault(key, {})
        for c in tbl.value_columns:
            v = ev.get(c)
            deleted = bool(ev.get("del_" + c) or False)
            if op == OP_POSTIMAGE:
                # postimage carries the FULL row: every column is written
                # (NULL means NULL), replicator Main.java:577-598.
                written, val = True, v
            elif v is not None:
                written, val = True, v
            elif deleted:
                written, val = True, None
            else:
                written, val = False, None
            if written:
                old = cells.get(c)
                if old is None or ts > old[1]:
                    cells[c] = (val, ts, ttl)
        # non-frozen collection columns (Main.java:203-276): a whole-map
        # overwrite is a collection tombstone at ts-1 + element writes at
        # ts; element adds/removals are per-element LWW cells
        for c in tbl.collection_columns:
            overwrite = bool(ev.get("del_" + c) or False)
            if op == OP_POSTIMAGE:
                overwrite = True  # postimage binds the full collection
            ccells = st.coll_cells.setdefault(key, {}).setdefault(c, {})
            if overwrite:
                tombs = st.coll_tombs.setdefault(key, {})
                if ts - 1 > tombs.get(c, NEG_INF):
                    tombs[c] = ts - 1
            for k, v in (ev.get(c) or {}).items():
                old = ccells.get(k)
                if old is None or ts > old[1]:
                    ccells[k] = (v, ts, ttl)
            for k in ev.get("del_elements_" + c) or ():
                old = ccells.get(k)
                if old is None or ts > old[1]:
                    ccells[k] = (None, ts, ttl)
        if op in (OP_ROW_INSERT, OP_POSTIMAGE):
            if ts > st.markers.get(key, (NEG_INF, None))[0]:
                st.markers[key] = (ts, ttl)
    elif op == OP_ROW_DELETE:
        if ts > st.row_tombs.get(key, NEG_INF):
            st.row_tombs[key] = ts
    elif op == OP_PARTITION_DELETE:
        if ts > st.part_tombs.get(repo, NEG_INF):
            st.part_tombs[repo] = ts
    elif op in (OP_RANGE_DELETE_START_INCLUSIVE, OP_RANGE_DELETE_START_EXCLUSIVE):
        st.pending_range[ev["stream_id"]] = (
            repo,
            ck,
            op == OP_RANGE_DELETE_START_INCLUSIVE,
        )
    elif op in (OP_RANGE_DELETE_END_INCLUSIVE, OP_RANGE_DELETE_END_EXCLUSIVE):
        start = st.pending_range.pop(ev["stream_id"], None)
        if start is None:
            raise ValueError("range end without start (stream pairing broken)")
        s_repo, lo, lo_incl = start
        hi_incl = op == OP_RANGE_DELETE_END_INCLUSIVE
        st.range_tombs.setdefault(s_repo, []).append(
            (lo, lo_incl, ck, hi_incl, ts)
        )
    elif op == OP_PREIMAGE:
        pass  # verification-only rows (replicator Main.java:653-666)
    else:
        raise ValueError(f"unknown opcode {op}")


def replay(events: dict, table: TableConfig = DEFAULT_TABLE) -> OracleState:
    """events: column-dict as produced by generator.generate_world()
    (already globally sorted by (ms, seq))."""
    st = OracleState(table=table)
    n = len(events["ms"])
    coll_keys = [
        k
        for c in table.collection_columns
        for k in (c, "del_" + c, "del_elements_" + c)
    ]
    for i in range(n):
        ev = {
            "op": events["op"][i],
            "ms": events["ms"][i],
            "seq": events["seq"][i],
            "ttl": events["ttl"][i],
            "stream_id": events["stream_id"][i],
            "repo": events["repo"][i],
            "path": events["path"][i],
            "commit": events["commit"][i],
            "lang": events["lang"][i],
            "content": events["content"][i],
            "del_commit": events["del_commit"][i],
            "del_lang": events["del_lang"][i],
            "del_content": events["del_content"][i],
        }
        for k in coll_keys:
            if k in events:
                ev[k] = events[k][i]
        apply_event(st, ev)
    return st


def final_state(st: OracleState, as_of_ms=None) -> list[dict]:
    """Visible rows, sorted by (repo, path); adds content_sha256 for the
    BASELINE per-row invariant. ``as_of_ms`` applies TTL expiry as of
    that instant (None = ignore TTLs, the replicator's view when nothing
    has expired yet)."""
    keys = (
        set(st.cells) | set(st.markers) | set(st.row_tombs) | set(st.coll_cells)
    )
    out = []
    for repo, ck in sorted(
        k for k in keys if any(v is not None for v in k[1])
    ):
        row = st.visible_row(repo, ck, as_of_ms)
        if row is not None:
            if "content" in row:
                row["content_sha256"] = (
                    hashlib.sha256(row["content"].encode()).hexdigest()
                    if row["content"] is not None
                    else None
                )
            out.append(row)
    return out
