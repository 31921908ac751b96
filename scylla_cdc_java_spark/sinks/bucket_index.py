"""Sharded on-disk bucket index — the root manifest's escape from
O(num_buckets) commits.

Round 4's hierarchical manifest made commits O(touched buckets) in
*bucket-manifest* writes, but the ROOT still carried one pointer entry
per bucket, json-serialized twice per commit (snapshot + pointer swap).
The round-5 contention probe (tools/commit_contention.py,
CONTENTION_r5.json) measured the consequence: the commit critical
section grows linearly with num_buckets — 18 ms at 1k buckets but
158 ms at 16k (1.4 MB root), capping a *whole table* (any number of
writers — commits serialize on one mutex) at ~6 commits/s exactly at
the 100 TB design point where num_buckets is 10^4-10^5.

This module shards the index the way Iceberg's manifest-list shards
file metadata:

    meta/index/base-<shard>-v<ver>.<tok>.json   immutable {bid: entry}
        for buckets with int(bid) % n_shards == shard
    meta/index/delta-v<ver>.<tok>.json          immutable {bid: entry
        | null}: one per data-changing commit, carrying ONLY that
        commit's touched buckets (null = bucket dropped by compaction)

and the root stores a small descriptor instead of the entries::

    "bucket_index": {"__sharded__": true, "n_shards": K,
                     "base": {"0": rel, ...}, "deltas": [rel, ...]}

A commit therefore writes O(touched) bytes: one delta file plus a root
whose size is O(n_shards + n_deltas), independent of num_buckets. When
the delta list reaches ``fold_deltas`` the committing writer folds all
pending deltas into new base shard files for the AFFECTED shards only
(written once, never rewritten — old files stay readable for retained
snapshots until vacuum), so lookup cost stays bounded and the fold's
O(affected shards) IO is amortized over ``fold_deltas`` commits.

Entries keep the exact round-4 shape ({path, n_segs, n_tomb_segs,
tomb_rows} pointers, or legacy inline states) — only their storage
moves. All files are write-once, so a shared rel-path -> parsed-JSON
cache (the sink's ``_bmeta_cache``) can never go stale.

Reference parity note: the reference's destination DB absorbs
concurrent writers' commits natively (scylla-cdc-replicator
Main.java:674-683 just writes to Scylla); this index is what lets the
lake sink match that at fleet scale instead of serializing every
writer behind one O(table-width) metadata rewrite.
"""

from __future__ import annotations

import json
import os
import uuid
import zlib
from collections.abc import MutableMapping

INDEX_DIR = os.path.join("meta", "index")

# buckets per base shard: keeps each shard file ~1024 entries (~90 KB)
# so a fold rewrites bounded-size files no matter how large num_buckets
DEFAULT_SHARD_SIZE = 1024


def atomic_write_json(full: str, obj, fsync: bool = True) -> None:
    """The ONE durable atomic-JSON-write used by every metadata file
    the root manifest can reference (index shards/deltas, per-bucket
    manifests, snapshots, the root itself). tmp + ``os.replace`` gives
    crash atomicity against process death; the fsync of the file
    before the rename (and of the directory after) extends that to
    power loss — without it the rename can journal before the data
    blocks land, leaving a committed root pointing at a zero-length
    side file, which bricks the table (sharding widened this blast
    radius: the OLD inline root only ever risked the newest root)."""
    tmp = full + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        if fsync:
            f.flush()
            os.fsync(f.fileno())
    os.replace(tmp, full)
    if fsync:
        dfd = os.open(os.path.dirname(full) or ".", os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
# fold pending deltas into base shards once this many accumulate: the
# point lookup cost is O(n_deltas) small-file reads (cached) and the
# root carries n_deltas path strings, so this bounds both
DEFAULT_FOLD_DELTAS = 32


def n_shards_for(num_buckets: int, shard_size: int = DEFAULT_SHARD_SIZE):
    return max(1, (int(num_buckets) + shard_size - 1) // shard_size)


def entry_fingerprint(entry: dict) -> str:
    """Exact change fingerprint for one bucket's root entry: pointer
    entries change their (write-once) path on every touch; legacy
    inline entries fall back to their segment lists. Equal fingerprints
    between two snapshots imply the bucket references the identical
    immutable segment set, hence identical visible content — the
    no-false-negatives property both the incremental datapipe
    (datapipe/incremental.py) and the change feed (sinks/changefeed.py)
    rest on."""
    if "path" in entry:
        return (f"{entry['path']}|{entry.get('n_segs', 0)}|"
                f"{entry.get('n_tomb_segs', 0)}|{entry.get('tomb_rows', 0)}")
    return "|".join(
        sorted(entry.get("segs", [])) + ["#"] +
        sorted(entry.get("tomb_segs", []))
    )


class ShardedBucketIndex(MutableMapping):
    """Lazy mapping ``{bucket_id: root pointer entry}`` backed by
    immutable base-shard files + delta overlays + an in-memory overlay
    of this commit's pending mutations. Point lookups touch only the
    delta files (small, cached) and one base shard; full enumeration
    (maintenance paths: compaction triggers, vacuum, ``manifest()``)
    materializes through the same write-once cache."""

    def __init__(self, root_dir: str, desc: dict, cache: dict | None = None):
        self.root_dir = root_dir
        self.n_shards = int(desc["n_shards"])
        self._base: dict[str, str] = dict(desc.get("base") or {})
        self._deltas: list[str] = list(desc.get("deltas") or [])
        self._overlay: dict[str, dict | None] = {}
        self._cache = cache if cache is not None else {}
        self._delta_view: dict | None = None  # merged deltas (lazy)

    # -- file plumbing --------------------------------------------------
    def _load(self, rel: str) -> dict:
        st = self._cache.get(rel)
        if st is None:
            with open(os.path.join(self.root_dir, rel)) as f:
                st = json.load(f)
            self._cache[rel] = st
        return st

    def _deltas_merged(self) -> dict:
        if self._delta_view is None:
            d: dict = {}
            for rel in self._deltas:
                d.update(self._load(rel))
            self._delta_view = d
        return self._delta_view

    def shard_of(self, b: str) -> int:
        try:
            return int(b) % self.n_shards
        except ValueError:  # non-decimal bucket id: stable string hash
            return zlib.crc32(str(b).encode()) % self.n_shards

    # -- mapping protocol ----------------------------------------------
    def __getitem__(self, b):
        b = str(b)
        for layer in (self._overlay, self._deltas_merged()):
            if b in layer:
                v = layer[b]
                if v is None:
                    raise KeyError(b)
                return v
        rel = self._base.get(str(self.shard_of(b)))
        if rel is None:
            raise KeyError(b)
        shard = self._load(rel)
        if b not in shard or shard[b] is None:
            raise KeyError(b)
        return shard[b]

    def __setitem__(self, b, entry):
        self._overlay[str(b)] = entry

    def __delitem__(self, b):
        b = str(b)
        if b not in self:
            raise KeyError(b)
        if self._in_lower(b):
            self._overlay[b] = None  # tombstone: serializes as JSON null
        else:
            # set-then-deleted within this same commit: nothing below
            # the overlay to shadow, so drop the overlay entry instead
            # of persisting a spurious null that every later
            # delta-merge and fold would carry forever
            del self._overlay[b]

    def _in_lower(self, b: str) -> bool:
        """True when the bucket exists in the delta/base layers beneath
        the pending overlay (a delta-layer null means deleted there,
        shadowing any base entry)."""
        dm = self._deltas_merged()
        if b in dm:
            return dm[b] is not None
        rel = self._base.get(str(self.shard_of(b)))
        if rel is None:
            return False
        return self._load(rel).get(b) is not None

    def _materialized(self) -> dict:
        out: dict = {}
        for rel in self._base.values():
            out.update(self._load(rel))
        out.update(self._deltas_merged())
        out.update(self._overlay)
        return {k: v for k, v in out.items() if v is not None}

    def __iter__(self):
        return iter(self._materialized())

    def __len__(self):
        return len(self._materialized())

    # Mapping's default items()/values() would re-__getitem__ per key;
    # maintenance paths enumerate thousands of entries, so serve them
    # straight off the materialized dict.
    def items(self):
        return self._materialized().items()

    def values(self):
        return self._materialized().values()

    def keys(self):
        return self._materialized().keys()

    def copy(self) -> "ShardedBucketIndex":
        """New index sharing the immutable base/delta layers (and the
        write-once cache) with an independent pending overlay — what a
        commit's ``build(cur)`` mutates."""
        c = ShardedBucketIndex(
            self.root_dir,
            {"n_shards": self.n_shards, "base": self._base,
             "deltas": self._deltas},
            cache=self._cache,
        )
        c._overlay = dict(self._overlay)
        c._delta_view = self._delta_view
        return c

    # -- persistence ----------------------------------------------------
    @staticmethod
    def _write_json(root_dir: str, rel: str, obj: dict) -> None:
        full = os.path.join(root_dir, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        atomic_write_json(full, obj)

    @classmethod
    def create(cls, root_dir: str, entries: dict, num_buckets: int,
               version: int, cache: dict | None = None,
               shard_size: int = DEFAULT_SHARD_SIZE) -> "ShardedBucketIndex":
        """Write a full base (no deltas) from a plain entries dict —
        first commit of a new table, or the one-time migration of a
        round-2/3/4 root whose index was inline. O(num_buckets) once."""
        n = n_shards_for(num_buckets, shard_size)
        shards: dict[int, dict] = {}
        idx = cls(root_dir, {"n_shards": n, "base": {}, "deltas": []},
                  cache=cache)
        for b, e in entries.items():
            if e is not None:
                shards.setdefault(idx.shard_of(str(b)), {})[str(b)] = e
        tok = uuid.uuid4().hex[:8]
        for s, ent in shards.items():
            rel = os.path.join(INDEX_DIR, f"base-{s}-v{version}.{tok}.json")
            cls._write_json(root_dir, rel, ent)
            if cache is not None:
                cache[rel] = ent
            idx._base[str(s)] = rel
        return idx

    def flush(self, version: int,
              fold_deltas: int = DEFAULT_FOLD_DELTAS) -> dict:
        """Persist pending overlay mutations as one immutable delta file
        (O(touched) — the per-commit cost) and return the descriptor to
        embed in the root. Must run inside the commit critical section:
        the delta list order is the rebase order. Folds base+deltas for
        the affected shards when the delta list reaches ``fold_deltas``
        (amortized; untouched shards keep their existing files)."""
        if self._overlay:
            rel = os.path.join(
                INDEX_DIR, f"delta-v{version}.{uuid.uuid4().hex[:8]}.json")
            self._write_json(self.root_dir, rel, self._overlay)
            self._cache[rel] = dict(self._overlay)
            self._deltas.append(rel)
            if self._delta_view is not None:
                # copy-on-write: ``copy()`` shares the merged-delta view
                # with its parent; updating it in place would leak this
                # commit's entries into an index object whose delta list
                # does NOT reference the new file
                self._delta_view = {**self._delta_view, **self._overlay}
            self._overlay = {}
        if len(self._deltas) >= fold_deltas:
            self._fold(version)
        return self.descriptor()

    def _fold(self, version: int) -> None:
        pending = self._deltas_merged()
        by_shard: dict[int, dict] = {}
        for b, e in pending.items():
            by_shard.setdefault(self.shard_of(b), {})[b] = e
        tok = uuid.uuid4().hex[:8]
        for s, delta_ent in by_shard.items():
            base_rel = self._base.get(str(s))
            merged = dict(self._load(base_rel)) if base_rel else {}
            merged.update(delta_ent)
            merged = {b: e for b, e in merged.items() if e is not None}
            rel = os.path.join(INDEX_DIR, f"base-{s}-v{version}.{tok}.json")
            self._write_json(self.root_dir, rel, merged)
            self._cache[rel] = merged
            self._base[str(s)] = rel
        self._deltas = []
        self._delta_view = None

    def descriptor(self) -> dict:
        """Root-embeddable form. Any un-flushed overlay is intentionally
        NOT represented — ``flush()`` first."""
        return {"__sharded__": True, "n_shards": self.n_shards,
                "base": dict(self._base), "deltas": list(self._deltas)}

    def referenced_files(self) -> set[str]:
        """Rel paths of every index file this descriptor needs — what
        vacuum must keep for a retained snapshot."""
        return set(self._base.values()) | set(self._deltas)

    @staticmethod
    def is_descriptor(obj) -> bool:
        return isinstance(obj, dict) and obj.get("__sharded__") is True


def copy_index(idx):
    """Commit-build copy that works for both index representations:
    plain dict (legacy roots, hand-built tests) and ShardedBucketIndex
    (never materializes the sharded one)."""
    return idx.copy() if isinstance(idx, ShardedBucketIndex) else dict(idx)
