"""Incremental datapipe maintenance over the CDC-maintained table.

The round-4 datapipe recomputed dedup/ANN state from scratch over a
static ``documents`` table; the pipeline this engine feeds runs those
continuously over the table ``Engine`` maintains. This module keeps a
**MinHash signature index** in lockstep with a ``ParquetMergeSink``
table, recomputing signatures ONLY for the buckets the CDC stream
touched since the last sync — O(touched) work per window against a
table whose total size is unbounded.

Why bucket-level (not row-level) diffing is the right grain here: the
sink already partitions rows AND all their mutation metadata by
``pmod(xxhash64(pk), num_buckets)``, and every data-changing commit
rewrites a touched bucket's manifest entry (a write-once file whose
path changes whenever the bucket's content can have changed). The
bucket entry path is therefore a free, exact change fingerprint — no
per-row change log, no timestamps to reason about, and deletes are
covered for free (a bucket whose rows were all deleted still gets a
new entry / drops out of the index). At 100 TB you size ``num_buckets``
so a bucket is a few hundred MB; a window touching k buckets costs one
k-bucket scan + signature pass + a k-partition overwrite of the index
— the same O(window) posture as the sink's own merge path.

Crash safety: the fingerprint state file is replaced atomically AFTER
the index partitions land, so a crash mid-sync leaves stale
fingerprints and the next ``sync()`` simply redoes those buckets
(signature computation is deterministic — redo is idempotent).

Equality with a full recompute is not asymptotic hand-waving; it is
hash-checked: the driver contract's ``dedup_incremental`` entry replays
a deterministic world window-by-window with a sync after EVERY window
and digest-compares the final index against the pure-Python golden
(signatures over the independent oracle's final state), and
tests/test_incremental.py additionally asserts sync-by-sync that only
touched buckets were rescanned and that deletes leave the index.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import lsh_candidates_from_signatures, minhash_signatures

BUCKET_COL = "__bucket"


def _entry_fingerprint(entry: dict) -> str:
    """Exact change fingerprint for one bucket's root entry: pointer
    entries change their (write-once) path on every touch; legacy
    inline entries fall back to their segment lists."""
    if "path" in entry:
        return (f"{entry['path']}|{entry.get('n_segs', 0)}|"
                f"{entry.get('n_tomb_segs', 0)}|{entry.get('tomb_rows', 0)}")
    return "|".join(
        sorted(entry.get("segs", [])) + ["#"] +
        sorted(entry.get("tomb_segs", []))
    )


class IncrementalMinHashIndex:
    """A MinHash signature index ``(doc id columns..., sig
    array<bigint>)`` stored as bucket-partitioned parquet, maintained
    incrementally against a ``ParquetMergeSink`` table.

    ``sync(sink)`` diffs the sink's per-bucket manifest fingerprints
    against the index's recorded state, rescans ONLY changed buckets
    (``sink.read(buckets=...)`` — partition-pruned file IO), recomputes
    their signatures, and dynamically overwrites exactly those index
    partitions. Buckets that vanished (all rows deleted + compacted
    away) or came back empty are dropped from the index.

    The signature recipe is ``dedup.minhash_signatures`` — pure-JVM
    shingle/permutation hashing, bit-identical to the pure-Python
    golden — so an incrementally-maintained index is value-identical to
    a full recompute over the current table (the property the contract
    digest checks).
    """

    def __init__(self, spark: SparkSession, path: str,
                 text_col: str = "content", num_hashes: int = 64,
                 bands: int = 16, shingle_k: int = 3, seed: int = 42):
        self.spark = spark
        self.path = path
        self.text_col = text_col
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_k = shingle_k
        self.seed = seed
        os.makedirs(path, exist_ok=True)

    # -- state ----------------------------------------------------------
    @property
    def _state_path(self) -> str:
        return os.path.join(self.path, "_index_state.json")

    def _load_state(self) -> dict:
        if not os.path.exists(self._state_path):
            return {"fingerprints": {}, "table_version": None}
        with open(self._state_path) as f:
            return json.load(f)

    def _save_state(self, st: dict) -> None:
        tmp = self._state_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(st, f)
        os.replace(tmp, self._state_path)

    @property
    def _sig_dir(self) -> str:
        return os.path.join(self.path, "sigs")

    # -- maintenance ----------------------------------------------------
    def sync(self, sink) -> dict:
        """Bring the index up to date with ``sink``'s current committed
        state. Returns ``{"changed": [...], "removed": [...],
        "table_version": v, "sync_s": s}`` — ``changed`` is the set of
        buckets rescanned (the incremental-cost evidence the tests
        assert on)."""
        t0 = time.time()
        root = sink._load_root()
        cur_fp = {
            str(b): _entry_fingerprint(e)
            for b, e in root["bucket_index"].items()
        }
        st = self._load_state()
        old_fp = st["fingerprints"]
        changed = sorted(
            (b for b in cur_fp if old_fp.get(b) != cur_fp[b]), key=int)
        removed = sorted((b for b in old_fp if b not in cur_fp), key=int)

        emptied: list[str] = []
        if changed:
            rows = sink.read(buckets=[int(b) for b in changed])
            docs = rows.select(
                *sink.table.primary_key,
                # NULL text = empty doc (the golden mirrors ``text or
                # ""``); without the coalesce the shingle array is NULL,
                # the explode emits nothing, and the doc silently drops
                # out of the index instead of carrying the empty-doc sig
                F.coalesce(F.col(self.text_col), F.lit("")).alias("_text"),
                F.concat_ws(
                    "\x1f", *[F.col(c) for c in sink.table.primary_key]
                ).alias("_doc_key"),
            )
            sigs = minhash_signatures(
                docs, text_col="_text", id_col="_doc_key",
                num_hashes=self.num_hashes, shingle_k=self.shingle_k,
                seed=self.seed,
            )
            out = (
                docs.join(sigs, "_doc_key")
                # the SINK's routing (partition-key columns only): the
                # index partition for a doc must be the bucket whose
                # manifest fingerprint governs its resync, or docs land
                # in partitions that never get overwritten again
                .withColumn(BUCKET_COL, sink._bucket_expr())
                .select(*sink.table.primary_key, "sig", BUCKET_COL)
            )
            # dynamic partition overwrite: replaces exactly the
            # partitions present in this batch, leaves the rest alone
            out = out.repartition(
                max(len(changed) // 4, 1), F.col(BUCKET_COL)).persist()
            # buckets that still HAVE rows, from THIS batch's output —
            # not from listdir, which also shows partitions written by
            # earlier syncs (a changed bucket whose rows were all
            # deleted writes no partition now, but its stale dir from a
            # previous sync would make it look present)
            with_rows = {
                str(r[0]) for r in out.select(BUCKET_COL).distinct().collect()
            }
            (
                out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(BUCKET_COL)
                .parquet(self._sig_dir)
            )
            out.unpersist()
            emptied = [b for b in changed if b not in with_rows]

        for b in removed + emptied:
            shutil.rmtree(
                os.path.join(self._sig_dir, f"{BUCKET_COL}={b}"),
                ignore_errors=True,
            )

        st = {"fingerprints": cur_fp, "table_version": root["version"]}
        self._save_state(st)
        return {"changed": changed, "removed": removed,
                "table_version": root["version"],
                "sync_s": time.time() - t0}

    # -- query side ------------------------------------------------------
    def signatures(self) -> DataFrame:
        """The current index: (pk columns..., sig, __bucket)."""
        if not os.path.isdir(self._sig_dir) or not any(
            d.startswith(BUCKET_COL + "=") for d in os.listdir(self._sig_dir)
        ):
            raise FileNotFoundError(
                f"no signatures at {self._sig_dir}; run sync() first")
        return self.spark.read.parquet(self._sig_dir)

    def lsh_candidates(self, id_cols: list[str],
                       max_bucket: int = 64) -> DataFrame:
        """Banded-LSH candidate pairs straight off the maintained index
        — no signature recomputation. ``id_cols``: the pk columns to
        concatenate into the pair ids."""
        sig = self.signatures().select(
            F.concat_ws("\x1f", *[F.col(c) for c in id_cols])
            .alias("_doc_key"),
            "sig",
        )
        return lsh_candidates_from_signatures(
            sig, id_col="_doc_key", num_hashes=self.num_hashes,
            bands=self.bands, max_bucket=max_bucket)
