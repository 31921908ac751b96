"""Bloom-filter bucket skipping for high-cardinality EQUALITY scans.

The third read-side pruning tier (PLANS.md §10). Zone maps prune on
range-correlated columns; sort-order evolution makes a CHOSEN dense
column row-group-skippable after a compaction. What neither touches is
an equality predicate on a high-cardinality *uniform* column — e.g.
"find the rows carrying commit sha X" on a table hash-bucketed by
(repo, path): every bucket's [min, max] over random hex spans
essentially the whole value space, so zone maps keep 100% of buckets,
and the sha is not worth owning the table's one persisted sort order.
A small per-segment Bloom filter answers exactly this: "can this
segment possibly contain value v?" — with no false negatives, so
pruning on a 'no' is a proof, and false positives only cost an extra
bucket read. This is the Parquet/Iceberg bloom-filter analogue lifted
to this sink's manifest grain, where it can skip whole BUCKETS (files
never opened) instead of row groups inside an already-open file.

Two halves that must agree on one hash function:

- **Build (JVM, distributed)**: at every merge/compact/rebucket the
  just-staged segment is one extra Spark aggregation away from its
  bloom — k positions per non-null value via chained ``xxhash64``
  (``pos_i = pmod(xxhash64(lit('bf<i>'), col), m)``), OR-folded into
  64-bit words by a map-side-partial ``bit_or`` aggregate grouped on
  (bucket, column, word). Driver receives only the set words —
  O(touched buckets x set bits/64), metadata scale.
- **Probe (driver, pure Python)**: ``scan()`` planning hashes the
  filter literal with a from-scratch XXH64 implementation below and
  tests the k bits. Spark's ``xxhash64`` is spec-conformant XXH64 over
  the UTF-8 bytes, seed 42, with multi-column calls chaining each
  value's hash as the next seed — ``tests/test_bloom.py`` pins exact
  parity on randomized strings, so the driver probes the very bits the
  JVM set (a mismatch would only ever FAIL pruning loudly in that
  test, never silently drop a bucket: no false negatives requires
  parity, and parity is pinned).

Sizing: defaults m=65536 bits (8 KiB raw), k=6. A bucket-segment with
n=8k distinct values gives kn/m ~ 0.73 -> FPR ~ 2% — at 10^5 buckets
an equality scan opens the handful of true buckets plus ~2% noise
instead of all of them. Bitmaps are zlib+base64 in the per-bucket
manifest (sparse segments compress to tens of bytes); per-bucket
manifests are already per-bucket FILES (hierarchical index), so the
root stays O(1) and commit cost stays O(touched buckets).

Reference parity note: scylla-cdc-java has no scan path at all (its
consumer streams changes outward, Main.java:674-683); this tier exists
for the 100 TB serving/maintenance reads this engine adds on top.
"""
from __future__ import annotations

import base64
import functools
import zlib

# reserved key inside a segment's per-column stats dict ("stats" in the
# per-bucket manifest) — rides every existing carry/drop rebase path
# (merge append, compact replace, rebucket rebuild) with zero changes
BLOOM_KEY = "__bloom__"

DEFAULT_BLOOM_BITS = 1 << 16
DEFAULT_BLOOM_HASHES = 6

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_SPARK_SEED = 42  # XxHash64's default seed in catalyst


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int) -> int:
    """Spec-conformant XXH64 (unsigned result). Written from the
    public algorithm description; kept dependency-free so the scan
    planner can probe JVM-built blooms without a Spark job."""
    seed &= _MASK
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7)
             + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxhash64_strings(values, seed: int = _SPARK_SEED) -> int:
    """Spark's ``xxhash64(col1, col2, ...)`` over STRING values,
    driver-side: catalyst chains the running hash as the next field's
    seed, starting from the default seed 42. Returns the UNSIGNED
    64-bit hash; reinterpret as a signed long before ``%`` to mirror
    ``pmod``. Parity with the JVM is pinned by a randomized test
    (tests/test_lookup.py) including multi-column keys."""
    h = seed
    for v in values:
        h = xxh64(v.encode("utf-8"), h)
    return h


def bucket_for_key(values, num_buckets: int) -> int:
    """Driver-side twin of the sink's routing expression
    ``pmod(xxhash64(*partition_key), num_buckets)`` — lets a point
    lookup route to its bucket with ZERO Spark jobs (the previous
    1-row job put a fixed ~100 ms scheduler floor under every lookup
    regardless of data)."""
    h = xxhash64_strings(values)
    if h >= 1 << 63:  # reinterpret as Java signed long
        h -= 1 << 64
    return h % num_buckets


@functools.lru_cache(maxsize=64)
def _probe_seed(i: int) -> int:
    """Seed of hash function i — what ``xxhash64(lit('bf<i>'), col)``
    chains into the value's hash: the literal's own hash under the
    default seed."""
    return xxh64(f"bf{i}".encode(), _SPARK_SEED)


def probe_positions(value: str, m: int, k: int) -> list[int]:
    """The k bit positions of ``value`` — MUST equal the JVM's
    ``pmod(xxhash64(lit('bf<i>'), col), m)`` per i. Spark's pmod of a
    (signed) long by a positive int is the non-negative residue, which
    is exactly Python's ``%`` on the sign-interpreted hash."""
    data = value.encode("utf-8")
    out = []
    for i in range(k):
        h = xxh64(data, _probe_seed(i))
        if h >= 1 << 63:  # reinterpret as Java signed long
            h -= 1 << 64
        out.append(h % m)
    return out


def position_exprs(col, m: int, k: int):
    """The JVM-side twins of ``probe_positions`` as Column
    expressions (caller supplies ``pyspark.sql.functions`` names)."""
    from pyspark.sql import functions as F

    return [
        F.pmod(F.xxhash64(F.lit(f"bf{i}"), col), F.lit(m))
        for i in range(k)
    ]


def encode_bitmap(words: dict[int, int], m: int, k: int) -> dict:
    """Pack sparse {word_index: 64-bit word} (bit_or aggregate output,
    Java signed longs) into the manifest spec
    ``{"m", "k", "z": base64(zlib(bitmap))}``. Word w's long covers
    positions [w*64, w*64+64), bit j = position % 64 — so position p
    lives at byte p>>3, bit p&7 of the little-endian packed bytes."""
    buf = bytearray((m + 63) // 64 * 8)
    for w, word in words.items():
        buf[w * 8:w * 8 + 8] = (word & _MASK).to_bytes(8, "little")
    return {"m": int(m), "k": int(k),
            "z": base64.b64encode(zlib.compress(bytes(buf), 6)).decode()}


@functools.lru_cache(maxsize=512)
def _decoded(z: str) -> bytes:
    return zlib.decompress(base64.b64decode(z))


def may_contain(spec, value) -> bool:
    """Bloom membership test; True = cannot rule out. Malformed or
    foreign specs degrade to True (advisory stats never make a read
    wrong), exactly like unreadable zone maps."""
    if not isinstance(spec, dict) or not isinstance(value, str):
        return True
    m, k, z = spec.get("m"), spec.get("k"), spec.get("z")
    if (not isinstance(m, int) or not isinstance(k, int)
            or not isinstance(z, str) or m <= 0 or not 0 < k <= 32):
        return True
    try:
        bits = _decoded(z)
    except Exception:
        return True
    if len(bits) * 8 < m:
        return True
    return all(
        bits[p >> 3] >> (p & 7) & 1 for p in probe_positions(value, m, k)
    )
