"""Window-planner unit tests — port of the reference's four
fetching-window suites (scylla-cdc-lib src/test .../fetchingwindow/
FetchingWindowFactory_{ComputeFetchingWindow,CreateFetchingWindow,
CropToLimit,ExceedsLimit}Test.java), same boundary scenarios, injected
clock."""

import pytest

from scylla_cdc_java_spark.model import EngineConfig, SEQ_MOD, pack_time
from scylla_cdc_java_spark.plans.windows import (
    EPOCH_START,
    NotReady,
    compute_fetching_window,
    _pack_ms_bound,
)

CFG = EngineConfig()  # 10s watermark, 30s limit
MS = 1_000_000_000_000  # arbitrary "now" base


def test_watermark_blocks_window_inside_late_writes():
    # start at now-5s: inside the 10s late-writes window -> not ready
    start = _pack_ms_bound(MS - 5_000)
    with pytest.raises(NotReady):
        compute_fetching_window(start, None, MS, CFG)


def test_watermark_exactly_at_start_blocks():
    start = _pack_ms_bound(MS - CFG.late_writes_window_ms)
    with pytest.raises(NotReady):
        compute_fetching_window(start, None, MS, CFG)


def test_open_generation_window_capped_at_watermark():
    start = _pack_ms_bound(MS - 25_000)  # 15s of readable log
    w = compute_fetching_window(start, None, MS, CFG)
    assert w.end_ts == _pack_ms_bound(MS - CFG.late_writes_window_ms)
    assert not w.last_window and not w.cropped


def test_crop_to_limit():
    start = _pack_ms_bound(MS - 100_000)  # 90s readable -> crop to 30s
    w = compute_fetching_window(start, None, MS, CFG)
    assert w.end_ts == start + CFG.window_length_limit_ms * SEQ_MOD
    assert w.cropped and not w.last_window


def test_crop_boundary_exact_limit_not_cropped():
    # exactly limit-long window is not cropped (boundary case of
    # ExceedsLimitTest)
    start = _pack_ms_bound(MS - CFG.late_writes_window_ms - CFG.window_length_limit_ms)
    w = compute_fetching_window(start, None, MS, CFG)
    assert not w.cropped
    assert w.end_ts == _pack_ms_bound(MS - CFG.late_writes_window_ms)


def test_epoch_zero_never_cropped():
    # first catch-up reads everything (FetchingWindowFactory.java:45)
    w = compute_fetching_window(EPOCH_START, None, MS, CFG)
    assert not w.cropped
    assert w.end_ts == _pack_ms_bound(MS - CFG.late_writes_window_ms)


def test_generation_end_marks_last_window():
    gen_end = MS - 60_000
    start = _pack_ms_bound(gen_end - 20_000)
    w = compute_fetching_window(start, gen_end, MS, CFG)
    assert w.last_window
    assert w.end_ts == _pack_ms_bound(gen_end)


def test_generation_end_beyond_watermark_not_last():
    gen_end = MS - 5_000  # inside watermark
    start = _pack_ms_bound(MS - 20_000)
    w = compute_fetching_window(start, gen_end, MS, CFG)
    assert not w.last_window
    assert w.end_ts == _pack_ms_bound(MS - CFG.late_writes_window_ms)


def test_cropped_generation_end_not_last():
    gen_end = MS - 20_000
    start = _pack_ms_bound(gen_end - 100_000)
    w = compute_fetching_window(start, gen_end, MS, CFG)
    assert w.cropped and not w.last_window


def test_windows_chain_half_open():
    start = EPOCH_START
    w1 = compute_fetching_window(start, None, MS, CFG)
    with pytest.raises(NotReady):
        # immediately re-polling from w1.end with same clock: empty
        compute_fetching_window(w1.end_ts, None, MS, CFG)
    w2 = compute_fetching_window(w1.end_ts, None, MS + 40_000, CFG)
    assert w2.start_ts == w1.end_ts


def test_pack_time_total_order():
    assert pack_time(1, 5) < pack_time(2, 0)
    assert pack_time(1, 5) < pack_time(1, 6)
