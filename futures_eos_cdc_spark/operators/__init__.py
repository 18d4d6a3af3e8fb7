from . import signal_pipeline

__all__ = ["signal_pipeline"]
