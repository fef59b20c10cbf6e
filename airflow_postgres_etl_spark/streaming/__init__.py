from .doc_stream import self_dedup, stream_dedup_ingest
from .file_stream import dedup_event_stream, stream_ingest, windowed_event_counts

__all__ = [
    "dedup_event_stream",
    "self_dedup",
    "stream_dedup_ingest",
    "stream_ingest",
    "windowed_event_counts",
]
