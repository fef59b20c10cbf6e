from .queries import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
