"""Fetching-window planner — re-creation of
``FetchingWindowFactory`` (reference: scylla-cdc-lib
worker/fetchingwindow/FetchingWindowFactory.java) with an injected clock,
matching the reference's own unit-test scenarios (SURVEY.md section 5):

- late-writes watermark: never read past ``now - 10s``
  (LATE_WRITES_WINDOW_SECONDS, FetchingWindowFactory.java:16,31-41);
- crop to <= 30s (WINDOW_LENGTH_LIMIT_SECONDS, :17,44-52) — EXCEPT when
  the window starts at epoch 0 (first catch-up/backfill reads everything,
  :45);
- a window reaching the generation's end timestamp is the *last* window
  of that generation (:36-38 + Worker.java:121-125);
- windows are half-open ``(start, end]`` and chain: the next window starts
  at the previous end (Worker.java:105-130).

Bounds are expressed in *packed* cdc$ts units (model.pack_time) so the
scan predicate is a single int64 comparison; ms-level bounds are packed
as ``pack_time(ms, 0) - 1`` = "everything strictly before ms".
"""

from __future__ import annotations

from dataclasses import dataclass

from ..model import SEQ_MOD, EngineConfig, pack_time

EPOCH_START = -1  # packed-ts lower bound meaning "from the beginning"


class NotReady(Exception):
    """Window start is inside the late-writes watermark — caller should
    back off and retry (reference sleeps 30s, Worker.java:93-98)."""


@dataclass(frozen=True)
class FetchingWindow:
    start_ts: int  # exclusive, packed
    end_ts: int  # inclusive, packed
    last_window: bool  # reached generation end
    cropped: bool  # hit the 30s length cap

    @property
    def empty(self) -> bool:
        return self.end_ts <= self.start_ts


def _pack_ms_bound(ms: int) -> int:
    """Packed ts covering everything strictly before ``ms``."""
    return pack_time(ms, 0) - 1


def compute_fetching_window(
    start_ts: int,
    generation_end_ms: int | None,
    now_ms: int,
    cfg: EngineConfig,
) -> FetchingWindow:
    """start_ts: packed exclusive lower bound (EPOCH_START on first run).

    Raises NotReady when the watermark hasn't passed the window start.
    """
    watermark_ms = now_ms - cfg.late_writes_window_ms
    wm_ts = _pack_ms_bound(watermark_ms)

    if generation_end_ms is not None and _pack_ms_bound(generation_end_ms) <= wm_ts:
        end = _pack_ms_bound(generation_end_ms)
        last = True
    else:
        end = wm_ts
        last = False

    if end <= start_ts:
        raise NotReady(f"watermark {watermark_ms}ms not past window start")

    cropped = False
    if start_ts != EPOCH_START:
        # crop to the length limit — epoch-0 backfill is exempt
        # (FetchingWindowFactory.java:45)
        limit_end = start_ts + cfg.window_length_limit_ms * SEQ_MOD
        if end > limit_end:
            end = limit_end
            last = False
            cropped = True
    return FetchingWindow(start_ts=start_ts, end_ts=end, last_window=last, cropped=cropped)
