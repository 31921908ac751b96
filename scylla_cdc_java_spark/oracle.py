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
from bisect import insort
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


@dataclass
class OracleState:
    table: TableConfig = DEFAULT_TABLE
    # (repo, path) -> {col: (value_or_None, ts)}
    cells: dict = field(default_factory=dict)
    # (repo, path) -> marker ts (from INSERT)
    markers: dict = field(default_factory=dict)
    # (repo, path) -> row tombstone ts
    row_tombs: dict = field(default_factory=dict)
    # repo -> partition tombstone ts
    part_tombs: dict = field(default_factory=dict)
    # repo -> sorted list of (lo, lo_incl, hi, hi_incl, ts)
    range_tombs: dict = field(default_factory=dict)
    # stream_id -> pending (repo, lo_path, inclusive) range start
    pending_range: dict = field(default_factory=dict)

    def covering_tomb(self, repo: str, path: str) -> int:
        t = self.row_tombs.get((repo, path), NEG_INF)
        t = max(t, self.part_tombs.get(repo, NEG_INF))
        for lo, lo_incl, hi, hi_incl, ts in self.range_tombs.get(repo, ()):
            lo_ok = (path >= lo) if lo_incl else (path > lo)
            hi_ok = (path <= hi) if hi_incl else (path < hi)
            if lo_ok and hi_ok:
                t = max(t, ts)
        return t

    def row_live(self, repo: str, path: str) -> bool:
        tomb = self.covering_tomb(repo, path)
        if self.markers.get((repo, path), NEG_INF) > tomb:
            return True
        for v, ts in self.cells.get((repo, path), {}).values():
            if v is not None and ts > tomb:
                return True
        return False

    def visible_row(self, repo: str, path: str) -> dict | None:
        if not self.row_live(repo, path):
            return None
        tomb = self.covering_tomb(repo, path)
        out = {"repo": repo, "path": path}
        cells = self.cells.get((repo, path), {})
        for c in self.table.value_columns:
            v, ts = cells.get(c, (None, NEG_INF))
            out[c] = v if (v is not None and ts > tomb) else None
        return out


def apply_event(st: OracleState, ev: dict) -> None:
    """ev keys: op, ms, seq (or ts), stream_id, repo, path, value columns,
    del_<col> markers."""
    ts = ev.get("ts")
    if ts is None:
        ts = pack_time(ev["ms"], ev["seq"])
    op = ev["op"]
    repo = ev["repo"]
    path = ev.get("path")
    key = (repo, path)
    tbl = st.table

    if op in (OP_ROW_UPDATE, OP_ROW_INSERT, OP_POSTIMAGE):
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
                    cells[c] = (val, ts)
        if op in (OP_ROW_INSERT, OP_POSTIMAGE):
            if ts > st.markers.get(key, NEG_INF):
                st.markers[key] = ts
    elif op == OP_ROW_DELETE:
        if ts > st.row_tombs.get(key, NEG_INF):
            st.row_tombs[key] = ts
    elif op == OP_PARTITION_DELETE:
        if ts > st.part_tombs.get(repo, NEG_INF):
            st.part_tombs[repo] = ts
    elif op in (OP_RANGE_DELETE_START_INCLUSIVE, OP_RANGE_DELETE_START_EXCLUSIVE):
        st.pending_range[ev["stream_id"]] = (
            repo,
            path,
            op == OP_RANGE_DELETE_START_INCLUSIVE,
        )
    elif op in (OP_RANGE_DELETE_END_INCLUSIVE, OP_RANGE_DELETE_END_EXCLUSIVE):
        start = st.pending_range.pop(ev["stream_id"], None)
        if start is None:
            raise ValueError("range end without start (stream pairing broken)")
        s_repo, lo, lo_incl = start
        hi_incl = op == OP_RANGE_DELETE_END_INCLUSIVE
        insort(
            st.range_tombs.setdefault(s_repo, []),
            (lo, lo_incl, path, hi_incl, ts),
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
    for i in range(n):
        apply_event(
            st,
            {
                "op": events["op"][i],
                "ms": events["ms"][i],
                "seq": events["seq"][i],
                "stream_id": events["stream_id"][i],
                "repo": events["repo"][i],
                "path": events["path"][i],
                "commit": events["commit"][i],
                "lang": events["lang"][i],
                "content": events["content"][i],
                "del_commit": events["del_commit"][i],
                "del_lang": events["del_lang"][i],
                "del_content": events["del_content"][i],
            },
        )
    return st


def final_state(st: OracleState) -> list[dict]:
    """Visible rows, sorted by (repo, path); adds content_sha256 for the
    BASELINE per-row invariant."""
    keys = set(st.cells) | set(st.markers) | set(st.row_tombs)
    out = []
    for repo, path in sorted(k for k in keys if k[1] is not None):
        row = st.visible_row(repo, path)
        if row is not None:
            row["content_sha256"] = (
                hashlib.sha256(row["content"].encode()).hexdigest()
                if row["content"] is not None
                else None
            )
            out.append(row)
    return out
