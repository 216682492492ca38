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

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Fallback events schema (legacy nanos-as-long generation). The live
#: schema is ALWAYS inferred from the parquet footer in
#: :func:`read_events_stream` — a hardcoded schema silently yields NULL
#: rows when the physical encoding drifts (a file-stream source applies
#: its schema to every file without validation), which once broke the
#: whole streaming parity suite. Kept only as a documented default for
#: callers constructing synthetic streams.
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


def stage_events_multifile(
    spark: SparkSession,
    events_path: str,
    n_files: int = 4,
    stage_root: str | None = None,
) -> str:
    """Re-lay a bounded events table as ``n_files`` parquet files in a
    staging directory and return that directory.

    A single-file table replayed through :func:`read_events_stream`
    collapses into ONE micro-batch no matter what ``maxFilesPerTrigger``
    says — the epoch machinery (watermark advancement, state eviction,
    idempotent ledger under replay) never actually turns over. Streaming
    the multi-file copy with one file per trigger provably crosses
    >= ``n_files`` epochs; gates assert it via ``query.recentProgress``.

    The staged copy is keyed by source path + file count and reused
    across calls (a ``_SUCCESS`` marker completes the write), so
    repeated gate runs pay the re-layout once.
    """
    import os
    import tempfile

    key = hashlib.md5(
        f"{os.path.abspath(events_path)}::{n_files}".encode()
    ).hexdigest()[:12]
    root = stage_root or os.path.join(
        tempfile.gettempdir(), "mlx_vector_db_spark-event-stages"
    )
    stage = os.path.join(root, f"events-{key}")
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        (
            spark.read.parquet(events_path)
            .repartition(int(n_files))
            .write.mode("overwrite")
            .parquet(stage)
        )
    return stage


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
    # Infer the schema from the actual parquet footer: the file-stream
    # source applies a declared schema to every file WITHOUT validation
    # and emits NULLs on mismatch, so hardcoding the physical encoding
    # of `ts` (nanos-long vs NTZ-micros vs zoned-micros) is a silent
    # corruption bug. One cheap driver-side footer read; no data scan.
    inferred = spark.read.parquet(events_path).schema
    raw = (
        spark.readStream.format("parquet")
        .schema(inferred)
        .option("maxFilesPerTrigger", 1)
        .load(events_path)
    )
    # Shared normalizer: same expression the batch path uses, so stream
    # and batch agree on event_time for all three physical encodings.
    from mlx_vector_db_spark.functions.time import event_time_col

    return raw.withColumn("event_time", event_time_col(raw))


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


def interval_join(
    events: DataFrame,
    left_type: str = "view",
    right_type: str = "purchase",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: pair each ``left_type`` event with
    every ``right_type`` event of the SAME user that lands within
    ``[left_time, left_time + within]`` — the attribution join
    (view→purchase, impression→click) every event pipeline runs.

    Works identically on a streaming frame (both sides watermarked; the
    time-bound condition lets Spark expire join state once the
    watermark passes ``left_time + within``, so state is bounded at any
    scale) and on a batch frame (``withWatermark`` is a no-op there) —
    the batch twin IS the oracle for the streaming run.

    Shuffle key is ``user_id`` on both sides — co-partitioned, one
    exchange each, no broadcast needed at any scale.
    """
    lhs = (
        events.where(F.col("event_type") == left_type)
        .select(
            "user_id",
            F.col("event_id").alias("left_id"),
            F.col("event_time").alias("left_time"),
        )
        .withWatermark("left_time", watermark)
    )
    rhs = (
        events.where(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user_id"),
            F.col("event_id").alias("right_id"),
            F.col("event_time").alias("right_time"),
        )
        .withWatermark("right_time", watermark)
    )
    cond = (
        (lhs.user_id == rhs.r_user_id)
        & (rhs.right_time >= lhs.left_time)
        & (rhs.right_time <= lhs.left_time + F.expr(f"INTERVAL {within}"))
    )
    return lhs.join(rhs, cond).select(
        "user_id",
        "left_id",
        "right_id",
        (
            F.unix_timestamp("right_time") - F.unix_timestamp("left_time")
        ).cast("long").alias("secs_between"),
    )


#: one row per committed micro-batch — the durable analog of the
#: reference's in-memory operations dict (api/routes/batch_v1.py:103-172),
#: which vanished on restart; this one is a queryable parquet table.
OPERATIONS_LOG_SCHEMA = (
    "operation string, batch_id long, rows_added long, "
    "completed_at double, store string, status string"
)


def _store_key(store) -> str:
    return f"{store.config.user_id}_{store.config.model_id}"


def _logged_epochs(
    spark: SparkSession, operations_log: str, operation: str, store_key: str
) -> set:
    """batch_ids already committed for this (operation, store) pair —
    the ledger key. Keying on the pair (not operation alone) lets many
    stores share one log without skipping each other's epochs. Empty
    when the log doesn't exist yet."""
    import os

    if not os.path.exists(operations_log):
        return set()
    rows = (
        spark.read.schema(OPERATIONS_LOG_SCHEMA)
        .parquet(operations_log)
        .where(
            (F.col("operation") == operation)
            & (F.col("store") == store_key)
            # failed rows are visibility, not commits: a retried epoch
            # whose earlier attempt logged 'failed' must re-run
            & (F.col("status") == "completed")
        )
        .select("batch_id")
        .distinct()
        .collect()
    )
    return {int(r[0]) for r in rows}


def ingest_batch(
    store,
    batch_df: DataFrame,
    epoch_id: int,
    query_name: str = "vector_ingest",
    operations_log: str | None = None,
    seen_epochs: set | None = None,
    dedup_threshold: float | None = None,
) -> int:
    """Idempotently append one (micro-)batch to a store.

    foreachBatch is at-least-once: a batch retried after a failure
    re-runs the append into plain Parquet (non-transactional), which
    would duplicate vectors. With an ``operations_log``, the log is the
    commit ledger: an ``epoch_id`` already logged for this
    (operation, store) pair is skipped, so replays are no-ops and
    ingest is effectively exactly-once at batch granularity. (The add
    itself and the log append are still two non-atomic writes — a
    crash between them can re-add one batch on restart; a table format
    with transactional MERGE closes that last window. Without a log:
    at-least-once. The ledger key is (operation, store, epoch), so use
    a distinct ``query_name`` per logical job — restarting the same
    name with a FRESH checkpoint resets epoch ids to 0 and collides
    with the old run's entries.)

    ``seen_epochs`` is the streaming loop's in-memory snapshot of the
    ledger; direct callers may omit it — the ledger is then read from
    disk per call (one small parquet scan).

    A failed add is recorded as a ``status='failed'`` row (surfaced by
    :func:`job_status`) and re-raised so the stream's retry machinery
    still fires. Returns the number of rows added (0 for skipped
    replays).
    """
    if seen_epochs is None and operations_log:
        seen_epochs = _logged_epochs(
            batch_df.sparkSession, operations_log, query_name, _store_key(store)
        )
    if int(epoch_id) in (seen_epochs or ()):  # replayed batch: already committed
        return 0
    if batch_df.isEmpty():
        return 0
    import time as _time

    def _log(n_rows: int, status: str) -> None:
        if not operations_log:
            return
        batch_df.sparkSession.createDataFrame(
            [
                (
                    query_name,
                    int(epoch_id),
                    int(n_rows),
                    float(_time.time()),
                    _store_key(store),
                    status,
                )
            ],
            OPERATIONS_LOG_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(operations_log)

    try:
        if dedup_threshold is not None:
            # dedup-on-write: each micro-batch screens itself against the
            # store and its own earlier rows (store.add_vectors_dedup)
            n, _rejected = store.add_vectors_dedup(
                batch_df, threshold=dedup_threshold
            )
        else:
            n = store.add_vectors(batch_df)
    except Exception:
        # failed batches are visible in job_status (and NOT added to
        # seen_epochs: the retry must re-attempt this epoch)
        _log(0, "failed")
        raise
    _log(n, "completed")
    if seen_epochs is not None:
        seen_epochs.add(int(epoch_id))
    return n


def streaming_ingest_vectors(
    stream: DataFrame,
    store,
    checkpoint_dir: str,
    query_name: str = "vector_ingest",
    operations_log: str | None = None,
    dedup_threshold: float | None = None,
    compact_max_files: int | None = None,
):
    """Append a streaming DataFrame of vectors into a VectorStore.

    ``dedup_threshold`` turns on dedup-on-write: each micro-batch is
    screened against the store (and itself) at that cosine threshold
    before appending — continuous incremental curation.

    ``compact_max_files`` turns on inline compaction: after each batch
    commits (and its epoch is ledgered), ``store.maybe_optimize`` runs
    with that threshold — a manifest-read probe per batch, an actual
    rewrite only when the file count exceeds it. Continuous ingest
    writes one parquet file per micro-batch; without a compaction hook
    a long-lived stream degrades every reader (the small-file problem —
    the same reason table formats pair streaming writes with background
    OPTIMIZE). Runs on the stream's own foreachBatch thread, strictly
    between appends, so it needs none of the cross-writer CAS machinery
    (which a concurrent external compactor exercises instead).

    Each micro-batch goes through the store's normal add path (norm
    projection + append) — chunked ingestion (reference S6). Progress is
    ``query.lastProgress`` live, plus (with ``operations_log``) a durable
    per-batch commit table queryable via :func:`job_status` — and that
    log doubles as the idempotency ledger making replayed batches no-ops
    (see :func:`ingest_batch` for the exact delivery guarantee).
    Returns the StreamingQuery.
    """
    # snapshot the ledger once at (re)start: within this run only this
    # callback appends to it, so the in-memory set stays authoritative
    seen = (
        _logged_epochs(
            stream.sparkSession, operations_log, query_name, _store_key(store)
        )
        if operations_log
        else set()
    )

    def _add(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_batch(
            store, batch_df, epoch_id,
            query_name=query_name,
            operations_log=operations_log,
            seen_epochs=seen,
            dedup_threshold=dedup_threshold,
        )
        if compact_max_files is not None:
            # after the ledger write: a crash mid-compaction replays as
            # a no-op append (epoch already committed) and the next
            # batch's probe re-triggers the compaction
            store.maybe_optimize(max_files=int(compact_max_files))

    return (
        stream.writeStream.foreachBatch(_add)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def read_operations_log(spark: SparkSession, operations_log: str) -> DataFrame:
    """The raw per-batch commit table (schema-stable even when empty)."""
    import os

    if not os.path.exists(operations_log):
        return spark.createDataFrame([], OPERATIONS_LOG_SCHEMA)
    return spark.read.schema(OPERATIONS_LOG_SCHEMA).parquet(operations_log)


def job_status(
    spark: SparkSession, operations_log: str, operation: str | None = None
) -> DataFrame:
    """One row per operation: the reference's GET /batch/jobs/{id} status
    surface (api/routes/batch_v1.py:103-172) as a queryable aggregate —
    durable across restarts because the source is the parquet log, not a
    process dict. Columns: operation, store, n_batches (committed),
    n_failures, rows_total, started_at, last_update, status
    ('completed' when no batch attempt ever failed, else 'had_failures'
    — failed attempts stay in the ledger as an audit trail even after a
    successful retry commits the epoch)."""
    log = read_operations_log(spark, operations_log)
    if operation is not None:
        log = log.where(F.col("operation") == operation)
    failures = F.count(F.when(F.col("status") == "failed", 1))
    return log.groupBy("operation", "store").agg(
        F.count(F.when(F.col("status") == "completed", 1)).alias("n_batches"),
        failures.alias("n_failures"),
        F.sum("rows_added").alias("rows_total"),
        F.min("completed_at").alias("started_at"),
        F.max("completed_at").alias("last_update"),
        F.when(failures == 0, "completed").otherwise("had_failures").alias(
            "status"
        ),
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


def streaming_knn_scores(
    queries_stream: DataFrame,
    store,
    checkpoint_dir: str,
    sink_path: str,
    k: int = 10,
    metric: str | None = None,
    filter_metadata=None,
    use_quantized: bool = False,
    query_name: str = "knn_stream",
):
    """Continuous semantic matching: answer a *stream* of query vectors
    against a VectorStore, appending results to a parquet sink.

    The data-plane op neither the reference nor stock Spark has: the
    reference serves queries request/response only, and a stream-static
    join can't express per-query top-k (the query block must be
    collected per batch). Each micro-batch instead runs the store's
    normal :meth:`VectorStore.batch_query` — so the INDEX path (IVF
    probe pruning, PQ compressed first pass via ``use_quantized``) and
    metadata pre-filters work identically to batch; results are the
    batch twin's exactly, plus an ``epoch_id`` provenance column
    (asserted in ``test_streaming_knn_matches_batch``).

    At scale this is the semantic-firehose shape: the store side stays
    partitioned on its cells, each micro-batch broadcasts only its own
    query block, and the sink write is the only write amplification.
    Input must have ``query_id`` and ``embedding`` columns. Returns the
    StreamingQuery.
    """
    def _score(batch_df: DataFrame, epoch_id: int) -> None:
        score_knn_batch(
            store, batch_df, epoch_id, sink_path,
            k=k, filter_metadata=filter_metadata, metric=metric,
            use_quantized=use_quantized,
        )

    return (
        queries_stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def score_knn_batch(
    store,
    batch_df: DataFrame,
    epoch_id: int,
    sink_path: str,
    k: int = 10,
    metric: str | None = None,
    filter_metadata=None,
    use_quantized: bool = False,
) -> None:
    """One micro-batch of :func:`streaming_knn_scores` — exposed so the
    delivery guarantee is directly testable. The sink is IDEMPOTENT
    under foreachBatch's at-least-once replays: results land in an
    ``epoch_id=N`` partition via dynamic partition overwrite, so a
    replayed epoch replaces its own partition instead of double-
    appending (the standard idempotent-parquet-sink pattern; the ingest
    path achieves the same with its operations-log ledger)."""
    if batch_df.isEmpty():
        return
    res = store.batch_query(
        batch_df,
        k=k,
        filter_metadata=filter_metadata,
        metric=metric,
        use_quantized=use_quantized,
    )
    (
        res.withColumn("epoch_id", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id")
        .parquet(sink_path)
    )


def streaming_maxsim_scores(
    query_token_stream: DataFrame,
    store,
    checkpoint_dir: str,
    sink_path: str,
    k: int = 10,
    overfetch: int = 4,
    funnel: "bool | None" = None,
    filter_metadata=None,
    query_name: str = "maxsim_stream",
):
    """Continuous LATE-INTERACTION matching (r12): answer a stream of
    multi-vector queries against the store's token tier, appending
    results to a parquet sink — :func:`streaming_knn_scores` for the
    ColBERT data model, a shape neither the single-vector reference nor
    stock Spark has.

    Input rows are query TOKENS ``(query_id, embedding)``; the
    MICRO-BATCH is the unit of query completeness — a query scores with
    the tokens present in its batch, so producers must emit a query's
    token set atomically (one file / one message), the same contract
    every batch `maxsim_query` call has for its query frame. Each
    micro-batch runs :meth:`VectorStore.maxsim_query`, so the
    funnel routing (exact by default, r13) and main-table metadata filtering
    work identically to batch; results carry an ``epoch_id`` provenance
    column and the sink is idempotent under foreachBatch's
    at-least-once replays (dynamic epoch-partition overwrite — the
    score_knn_batch pattern). Returns the StreamingQuery.
    """

    def _score(batch_df: DataFrame, epoch_id: int) -> None:
        score_maxsim_batch(
            store, batch_df, epoch_id, sink_path,
            k=k, overfetch=overfetch, funnel=funnel,
            filter_metadata=filter_metadata,
        )

    return (
        query_token_stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def score_maxsim_batch(
    store,
    batch_df: DataFrame,
    epoch_id: int,
    sink_path: str,
    k: int = 10,
    overfetch: int = 4,
    funnel: "bool | None" = None,
    filter_metadata=None,
) -> None:
    """One micro-batch of :func:`streaming_maxsim_scores` — exposed so
    the delivery guarantee is directly testable (the score_knn_batch
    discipline: replayed epochs replace their own ``epoch_id``
    partition instead of double-appending)."""
    if batch_df.isEmpty():
        return
    res = store.maxsim_query(
        batch_df,
        k=k,
        overfetch=overfetch,
        funnel=funnel,
        filter_metadata=filter_metadata,
    )
    (
        res.withColumn("epoch_id", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id")
        .parquet(sink_path)
    )
