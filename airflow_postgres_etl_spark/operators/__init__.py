from . import (  # noqa: F401
    dedup,
    joins,
    multimodal,
    scd,
    selection,
    similarity,
    skew,
    text,
)
from .ingest import (
    add_audit_columns,
    build_events,
    build_tracking,
    cast_epoch_seconds,
    dedup_keep_last,
    explode_events,
    filter_after_high_water_mark,
    flatten_event_struct,
    project,
    sentinels_to_null,
)

__all__ = [
    "add_audit_columns",
    "build_events",
    "build_tracking",
    "cast_epoch_seconds",
    "dedup_keep_last",
    "explode_events",
    "filter_after_high_water_mark",
    "flatten_event_struct",
    "project",
    "sentinels_to_null",
]
