from .queries import BASELINE_ONLY, ORACLE, QUERIES, ROTATION_EXCLUDED
from . import extensions  # noqa: F401  (registers extension queries)

__all__ = ["QUERIES", "ORACLE", "BASELINE_ONLY", "ROTATION_EXCLUDED"]
