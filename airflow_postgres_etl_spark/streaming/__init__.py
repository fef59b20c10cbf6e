from .file_stream import stream_ingest, windowed_event_counts

__all__ = ["stream_ingest", "windowed_event_counts"]
