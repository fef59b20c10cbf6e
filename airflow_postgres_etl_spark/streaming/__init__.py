from .doc_stream import (
    build_benchmark_grams,
    self_dedup,
    stream_dedup_ingest,
    stream_training_ingest,
)
from .file_stream import (
    dedup_event_stream,
    interval_join_streams,
    stream_append,
    stream_ingest,
    windowed_event_counts,
)
from .sketch_stream import (
    read_kmv_estimates,
    stream_sketch_ingest,
)
from .stateful import (
    running_user_totals,
    user_sessions_with_timeout,
)
from .vec_stream import (
    semantic_self_dedup,
    stream_semantic_ingest,
)

__all__ = [
    "build_benchmark_grams",
    "dedup_event_stream",
    "read_kmv_estimates",
    "stream_sketch_ingest",
    "stream_append",
    "interval_join_streams",
    "running_user_totals",
    "self_dedup",
    "semantic_self_dedup",
    "stream_dedup_ingest",
    "stream_ingest",
    "stream_semantic_ingest",
    "stream_training_ingest",
    "user_sessions_with_timeout",
    "windowed_event_counts",
]
