from .registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
