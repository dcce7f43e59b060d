from edgar_spark.streaming.pipeline import (
    sessionize_batch,
    sessionize_stream,
    stream_pages_ingest,
    windowed_event_agg,
)

__all__ = [
    "windowed_event_agg",
    "sessionize_batch",
    "sessionize_stream",
    "stream_pages_ingest",
]
