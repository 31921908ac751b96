from .engine import Engine, ReplayStats
from .stream_tail import StructuredTail

__all__ = ["Engine", "ReplayStats", "StructuredTail"]
