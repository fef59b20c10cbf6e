from .doc_stream import (
    build_benchmark_grams,
    self_dedup,
    stream_dedup_ingest,
    stream_training_ingest,
)
from .file_stream import (
    dedup_event_stream,
    interval_join_streams,
    stream_ingest,
    windowed_event_counts,
)

__all__ = [
    "build_benchmark_grams",
    "dedup_event_stream",
    "interval_join_streams",
    "self_dedup",
    "stream_dedup_ingest",
    "stream_ingest",
    "stream_training_ingest",
    "windowed_event_counts",
]
