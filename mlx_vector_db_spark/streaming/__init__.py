from mlx_vector_db_spark.streaming.ingest import (
    EVENTS_SCHEMA,
    ingest_batch,
    interval_join,
    job_status,
    read_events_stream,
    read_operations_log,
    score_knn_batch,
    streaming_dedup,
    streaming_ingest_vectors,
    streaming_knn_scores,
    streaming_upsert_vectors,
    windowed_event_counts,
)

__all__ = [
    "EVENTS_SCHEMA",
    "ingest_batch",
    "interval_join",
    "job_status",
    "read_events_stream",
    "read_operations_log",
    "score_knn_batch",
    "streaming_dedup",
    "streaming_ingest_vectors",
    "streaming_knn_scores",
    "streaming_upsert_vectors",
    "windowed_event_counts",
]
