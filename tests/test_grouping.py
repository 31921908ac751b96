"""splitStreams semantics (reference Master.java:59-105) — the suite the
reference itself lacks (SURVEY.md section 5 'notably untested')."""

import numpy as np

from scylla_cdc_java_spark.plans.grouping import (
    StreamGrouper,
    ring_tokens,
    split_streams,
    token_of,
)


def _streams(n, seed=7):
    rng = np.random.default_rng(seed)
    return [rng.bytes(16) for _ in range(n)]


def test_all_streams_assigned_exactly_once():
    ids = _streams(100)
    groups = split_streams(ids, ring_tokens(8))
    flat = [s for g in groups for s in g]
    assert sorted(flat) == sorted(ids)
    assert len(flat) == len(set(flat))


def test_groups_are_token_contiguous():
    ids = _streams(200)
    ring = ring_tokens(16)
    groups = split_streams(ids, ring)
    for g in groups:
        toks = [token_of(s) for s in g]
        # within a non-wraparound group tokens fall in one ring range;
        # the wraparound group (first) may contain the tail+head merge
        if g is not groups[0]:
            lo, hi = min(toks), max(toks)
            spanned = [b for b in ring if lo <= b < hi]
            assert len(spanned) <= 1


def test_wraparound_merge():
    # ids above the last boundary land in the same group as ids below
    # the first boundary (Master.java:69-79,94-102)
    ring = ring_tokens(4)
    lo_id = next(s for s in _streams(5000, 1) if token_of(s) <= ring[0])
    hi_id = next(s for s in _streams(5000, 2) if token_of(s) > ring[-1])
    groups = split_streams([lo_id, hi_id], ring)
    assert len(groups) == 1
    assert set(groups[0]) == {lo_id, hi_id}


def test_empty_groups_dropped():
    ids = _streams(3)
    groups = split_streams(ids, ring_tokens(64))
    assert all(groups)
    assert len(groups) <= 3


def test_grouper_dense_and_deterministic():
    ids = _streams(50)
    g1 = StreamGrouper(8).groups_for(123, ids)
    g2 = StreamGrouper(8).groups_for(123, ids)
    assert g1 == g2
    assert set(g1.values()) == set(range(max(g1.values()) + 1))
