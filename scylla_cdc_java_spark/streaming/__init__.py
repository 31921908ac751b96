from .engine import Engine, ReplayStats

__all__ = ["Engine", "ReplayStats"]
