"""Vnode-style stream grouping — a from-scratch re-creation of
``Master.splitStreams`` (reference: scylla-cdc-lib master/Master.java:59-105)
and the token hash (PartitioningHelper.java:13-15).

The reference hashes each 16-byte stream id with the cluster's murmur3
token function, sorts ids by token, and buckets them against the sorted
token-range end boundaries; ids below the first boundary and above the
last form one merged *wraparound* group (Master.java:69-79,94-102); empty
groups are dropped. Each group becomes one concurrently-consumed Task.

Spark mapping: a group id becomes the ``stream_group`` partition column of
the log — the generator stamps it at write time, so a per-group scan is
pure partition pruning (no IN-list evaluation per row), and one microbatch
DataFrame covers all groups at once (reference consumes all tasks of a
generation concurrently, Worker.java:135-139).

The "ring" here is synthetic (we have no cluster): ``ring_tokens(n)``
yields n deterministic boundaries evenly spaced over the signed-64 token
space, which is exactly what a balanced vnode ring looks like.
"""

from __future__ import annotations

import hashlib

TOKEN_MIN = -(1 << 63)
TOKEN_MAX = (1 << 63) - 1


def token_of(stream_id: bytes) -> int:
    """Deterministic 64-bit signed token of a stream id (stands in for
    murmur3; any stable uniform hash preserves the bucketing semantics)."""
    h = hashlib.blake2b(stream_id, digest_size=8).digest()
    return int.from_bytes(h, "big", signed=True)


def ring_tokens(n_ranges: int, seed: int = 0) -> list[int]:
    """Sorted token-range end boundaries of a synthetic balanced ring."""
    if n_ranges < 1:
        raise ValueError("need >= 1 token range")
    span = (1 << 64) // n_ranges
    # boundaries sit mid-span (a real vnode ring's range ends are arbitrary
    # tokens, never pinned to TOKEN_MAX) so a wraparound tail exists
    return sorted(TOKEN_MIN + (i + 1) * span - span // 2 for i in range(n_ranges))


def split_streams(stream_ids: list[bytes], ring: list[int]) -> list[list[bytes]]:
    """Bucket stream ids against sorted ring boundaries; merge the
    wraparound tail (> last boundary) into the first bucket (< first
    boundary); drop empty buckets. Mirrors Master.java:59-105.

    Returns a list of groups; each group is a token-sorted list of ids.
    """
    ring = sorted(ring)
    buckets: list[list[bytes]] = [[] for _ in range(len(ring))]
    wrap: list[bytes] = []
    for sid in sorted(stream_ids, key=token_of):
        t = token_of(sid)
        # find first boundary >= t (ids after the last boundary wrap)
        lo, hi = 0, len(ring)
        while lo < hi:
            mid = (lo + hi) // 2
            if ring[mid] >= t:
                hi = mid
            else:
                lo = mid + 1
        if lo == len(ring):
            wrap.append(sid)
        else:
            buckets[lo].append(sid)
    # wraparound merge: ids above the last boundary join the first range's
    # bucket (the ring is a circle), Master.java:69-79,94-102
    if wrap:
        buckets[0] = wrap + buckets[0]
    return [b for b in buckets if b]


class StreamGrouper:
    """Assigns each (generation, stream_id) a dense ``stream_group`` int.

    Used both by the generator (to stamp the partition column at write
    time) and by the engine driver (to know the group universe per
    generation for checkpoint lineage).
    """

    def __init__(self, n_ranges: int = 8, seed: int = 0):
        self.ring = ring_tokens(n_ranges, seed)
        self._cache: dict[int, dict[bytes, int]] = {}

    def groups_for(self, generation_start_ms: int, stream_ids: list[bytes]) -> dict[bytes, int]:
        got = self._cache.get(generation_start_ms)
        if got is not None:
            return got
        mapping: dict[bytes, int] = {}
        for g, members in enumerate(split_streams(stream_ids, self.ring)):
            for sid in members:
                mapping[sid] = g
        self._cache[generation_start_ms] = mapping
        return mapping

    def group_of(self, generation_start_ms: int, stream_id: bytes,
                 stream_ids: list[bytes]) -> int:
        return self.groups_for(generation_start_ms, stream_ids)[stream_id]
