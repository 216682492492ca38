from mlx_vector_db_spark.streaming.ingest import (
    EVENTS_SCHEMA,
    read_events_stream,
    streaming_dedup,
    streaming_ingest_vectors,
    streaming_upsert_vectors,
    windowed_event_counts,
)

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "streaming_dedup",
    "streaming_ingest_vectors",
    "streaming_upsert_vectors",
    "windowed_event_counts",
]
