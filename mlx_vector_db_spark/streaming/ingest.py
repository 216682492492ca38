"""Structured Streaming surface.

The reference has no data-plane streaming — only SSE progress polling of
batch jobs (api/routes/batch_v1.py:179-193) and chunked ingestion
(:426-441). The rebuild's north star adds real stream processing over
the ``events`` table and streaming vector ingest (SURVEY.md §2.10):

- :func:`windowed_event_counts` — watermarked tumbling/sliding window
  aggregates (state is bounded by the watermark; at scale the shuffle
  key is (window, event_type) and partial aggregation happens map-side
  exactly as in batch).
- :func:`streaming_dedup` — watermarked ``dropDuplicates``: exactly-once
  per key inside the lateness horizon, the streaming analog of exact
  dedup.
- :func:`streaming_ingest_vectors` — file-source stream of vector
  batches appended to a store directory via ``foreachBatch``: each
  micro-batch gets norms (and, with an IVFIndex, centroid ids) as pure
  projections, so ingest never triggers an index rebuild — the direct
  fix for the reference's rebuild-HNSW-per-add cliff
  (service/optimized_vector_store.py:110-113).

Progress (reference T1's operations log) comes from the standard
``StreamingQuery.lastProgress`` / ``StreamingQueryListener`` machinery
rather than a bespoke in-memory dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: events.parquet schema with ts as raw nanos (see queries.events_ts —
#: Spark's parquet reader cannot decode TIMESTAMP(NANOS) directly).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, events_path: str) -> DataFrame:
    """File-source stream over event parquet files with a proper event
    time column. One file per trigger keeps local tests deterministic.

    ``events_path`` must point at the events table itself (file or
    directory of event files) — a parquet file source applies the schema
    to *every* file under the path and emits NULL rows for mismatched
    ones, so never point it at a directory of mixed tables.
    """
    import os

    if os.path.isdir(events_path) and os.path.exists(
        os.path.join(events_path, "events.parquet")
    ):
        events_path = os.path.join(events_path, "events.parquet")
    if os.path.isfile(events_path):
        # the file stream source only accepts directories; stage a
        # symlink to the single file in a temp dir (local-test
        # convenience — real deployments stream a landing directory)
        import tempfile

        stage = tempfile.mkdtemp(prefix="events-stream-")
        os.symlink(
            os.path.abspath(events_path), os.path.join(stage, "events.parquet")
        )
        events_path = stage
    raw = (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(events_path)
    )
    # integral div: epoch nanos exceed a double's exact-integer range
    return raw.withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked (sliding) window counts + value sums per event type."""
    win = (
        F.window("event_time", window)
        if slide is None
        else F.window("event_time", window, slide)
    )
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native session windows: per user, events closer than ``gap``
    merge into one session (the streaming twin of the batch
    lag+cumsum sessionization in queries.q_events_sessionize)."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked exact dedup: keep the first occurrence of each key
    within the lateness horizon; state for keys older than the watermark
    is dropped, so memory is bounded at any scale."""
    return events.withWatermark("event_time", watermark).dropDuplicates(
        keys or ["event_id"]
    )


def streaming_ingest_vectors(
    stream: DataFrame,
    store,
    checkpoint_dir: str,
    query_name: str = "vector_ingest",
    operations_log: str | None = None,
):
    """Append a streaming DataFrame of vectors into a VectorStore.

    Each micro-batch goes through the store's normal add path (norm
    projection + append) — chunked ingestion (reference S6) with
    exactly-once bookkeeping from the checkpoint. Returns the
    StreamingQuery; poll ``query.lastProgress`` for live progress.

    ``operations_log``: optional parquet directory receiving one row
    per processed batch — the durable analog of the reference's
    in-memory operations dict (api/routes/batch_v1.py:103-172), which
    vanished on restart; this one is a queryable table.
    """
    import time as _time

    def _add(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        n = store.add_vectors(batch_df)
        if operations_log:
            spark = batch_df.sparkSession
            spark.createDataFrame(
                [
                    (
                        query_name,
                        int(epoch_id),
                        int(n),
                        float(_time.time()),
                        f"{store.config.user_id}_{store.config.model_id}",
                    )
                ],
                "operation string, batch_id long, rows_added long, "
                "completed_at double, store string",
            ).coalesce(1).write.mode("append").parquet(operations_log)

    return (
        stream.writeStream.foreachBatch(_add)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def streaming_upsert_vectors(
    stream: DataFrame,
    store,
    checkpoint_dir: str,
    query_name: str = "vector_upsert",
):
    """Merge a streaming DataFrame of keyed vectors into a VectorStore.

    The streaming twin of :meth:`VectorStore.upsert_vectors`: each
    micro-batch MERGEs on ``id`` — rows whose id exists are replaced,
    the rest append. A CDC-style feed (latest embedding per document)
    therefore converges the store to the stream's newest state instead
    of accumulating duplicates like the append path would. Batches must
    carry an ``id`` column; duplicate ids *within* one batch are
    resolved to the last row by stream order before the merge (native
    MERGE would reject them; a stream replaying updates makes
    last-write-wins the useful semantics here — documented deviation).
    Returns the StreamingQuery.
    """
    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if "id" not in batch_df.columns:
            raise ValueError("streaming upsert requires an 'id' column")
        # last-write-wins within the batch: keep the final occurrence of
        # each id (monotonically_increasing_id preserves batch order
        # within partitions; cross-partition duplicates of one key are
        # already unordered in any stream, so any winner is acceptable)
        from pyspark.sql import Window as _W
        from pyspark.sql import functions as _F

        deduped = (
            batch_df.withColumn("_seq", _F.monotonically_increasing_id())
            .withColumn(
                "_rn",
                _F.row_number().over(
                    _W.partitionBy("id").orderBy(_F.col("_seq").desc())
                ),
            )
            .where("_rn = 1")
            .drop("_seq", "_rn")
        )
        store.upsert_vectors(deduped)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
