from .literal_parse import parse_events, pyrepr_to_json
from .vectors import cosine_similarity_expr, dot_expr, l2_norm_expr

__all__ = [
    "parse_events",
    "pyrepr_to_json",
    "cosine_similarity_expr",
    "dot_expr",
    "l2_norm_expr",
]
