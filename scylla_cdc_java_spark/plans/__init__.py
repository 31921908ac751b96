from .grouping import StreamGrouper, split_streams, token_of
from .windows import FetchingWindow, NotReady, compute_fetching_window

__all__ = [
    "StreamGrouper",
    "split_streams",
    "token_of",
    "FetchingWindow",
    "NotReady",
    "compute_fetching_window",
]
