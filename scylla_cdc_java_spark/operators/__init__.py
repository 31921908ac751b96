from .fold import FoldResult, fold_batch, normalize_log
from .tombstones import extract_range_tombstones, pair_range_bounds

__all__ = [
    "FoldResult",
    "fold_batch",
    "normalize_log",
    "extract_range_tombstones",
    "pair_range_bounds",
]
