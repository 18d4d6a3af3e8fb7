from . import outbox, pipeline

__all__ = ["pipeline", "outbox"]
