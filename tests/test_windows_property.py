"""Property-based checks (hypothesis) of the fetching-window planner —
the invariants the reference's FetchingWindowFactory unit suites pin by
example (FetchingWindowFactory_*Test.java), generalized over the input
space, plus the chaining invariant (Worker.java:105-130) that a window
sequence tiles (start, generation-end] exactly with no gaps/overlap."""

from hypothesis import given, settings, strategies as st

from scylla_cdc_java_spark.model import SEQ_MOD, EngineConfig, pack_time
from scylla_cdc_java_spark.plans.windows import (
    EPOCH_START,
    NotReady,
    _pack_ms_bound,
    compute_fetching_window,
)

MS = st.integers(min_value=1_500_000_000_000, max_value=1_900_000_000_000)
CFG = EngineConfig()


@given(
    start_ms=MS,
    gen_len_ms=st.integers(min_value=0, max_value=7_200_000),
    now_off_ms=st.integers(min_value=-60_000, max_value=7_300_000),
    from_epoch=st.booleans(),
    open_generation=st.booleans(),
)
@settings(max_examples=400, deadline=None)
def test_single_window_invariants(start_ms, gen_len_ms, now_off_ms,
                                  from_epoch, open_generation):
    start_ts = EPOCH_START if from_epoch else _pack_ms_bound(start_ms)
    gen_end_ms = None if open_generation else start_ms + gen_len_ms
    now_ms = start_ms + now_off_ms
    try:
        w = compute_fetching_window(start_ts, gen_end_ms, now_ms, CFG)
    except NotReady:
        # only legal when the watermark hasn't passed the start (or the
        # generation is empty-up-to-watermark)
        wm = _pack_ms_bound(now_ms - CFG.late_writes_window_ms)
        cap = wm
        if gen_end_ms is not None:
            cap = min(cap, _pack_ms_bound(gen_end_ms))
        assert cap <= start_ts
        return

    # half-open, non-empty, chained from start
    assert w.end_ts > w.start_ts == start_ts
    # watermark: never read past now - late_window
    assert w.end_ts <= _pack_ms_bound(now_ms - CFG.late_writes_window_ms)
    # generation bound: never read past the generation end
    if gen_end_ms is not None:
        assert w.end_ts <= _pack_ms_bound(gen_end_ms)
        # last_window iff the window actually reaches the generation end
        assert w.last_window == (w.end_ts == _pack_ms_bound(gen_end_ms))
    else:
        assert not w.last_window
    # crop rule: bounded length unless epoch-0 backfill
    if start_ts != EPOCH_START:
        limit = start_ts + CFG.window_length_limit_ms * SEQ_MOD
        assert w.end_ts <= limit
        assert w.cropped == (w.end_ts == limit and not w.last_window) or (
            not w.cropped and w.end_ts < limit
        )
    if w.cropped:
        assert not w.last_window


@given(
    gen_start_ms=MS,
    gen_len_ms=st.integers(min_value=1_000, max_value=600_000),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=150, deadline=None)
def test_window_chain_tiles_generation_exactly(gen_start_ms, gen_len_ms, seed):
    """Chaining windows from epoch to the generation end must produce a
    strictly increasing, gap-free, overlap-free tiling that terminates
    with last_window — the exactly-once precondition (deterministic
    windows, SURVEY.md section 7 rule 3)."""
    gen_end_ms = gen_start_ms + gen_len_ms
    now_ms = gen_end_ms + CFG.late_writes_window_ms + 1 + (seed % 1000)
    start = EPOCH_START
    prev_end = None
    windows = []
    for _ in range(1000):
        w = compute_fetching_window(start, gen_end_ms, now_ms, CFG)
        windows.append(w)
        if prev_end is not None:
            assert w.start_ts == prev_end  # no gap, no overlap
        assert w.end_ts > w.start_ts
        prev_end = w.end_ts
        start = w.end_ts
        if w.last_window:
            break
    else:
        raise AssertionError("window chain did not terminate")
    assert windows[-1].last_window
    assert windows[-1].end_ts == _pack_ms_bound(gen_end_ms)
    # every non-final window is exactly the crop limit long (except the
    # epoch-0 backfill head)
    for w in windows[1:-1]:
        assert w.end_ts - w.start_ts == CFG.window_length_limit_ms * SEQ_MOD
