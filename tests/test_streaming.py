"""Structured Streaming: windowed counts match the batch oracle, dedup
drops duplicate keys, streaming vector ingest appends through the store.
Memory sink + processAllAvailable make the runs synchronous.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.queries import events_ts
from mlx_vector_db_spark.store import VectorStoreCatalog
from mlx_vector_db_spark.streaming import (
    read_events_stream,
    streaming_dedup,
    streaming_ingest_vectors,
    windowed_event_counts,
)


def _run_to_memory(df, name):
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def test_multifile_replay_crosses_micro_batch_epochs(spark, sf_small):
    """The staged multi-file replay must run >= 3 data micro-batches
    (one file per trigger) AND still aggregate to exactly the batch
    result — state provably carries across epochs instead of the whole
    replay collapsing into one batch."""
    from mlx_vector_db_spark.streaming.ingest import stage_events_multifile

    staged = stage_events_multifile(
        spark, f"{sf_small}/events.parquet", n_files=4
    )
    stream = read_events_stream(spark, staged)
    agg = windowed_event_counts(stream, window="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("epoch_counts")
        .start()
    )
    q.processAllAvailable()
    epochs = sum(1 for p in q.recentProgress if int(p["numInputRows"]) > 0)
    q.stop()
    assert epochs >= 3, f"expected >= 3 data micro-batches, saw {epochs}"
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM epoch_counts").collect()
    }
    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    exp = {
        (r["ws"], r["event_type"]): (r["n"], r["s"])
        for r in (
            ev.withColumn("event_time", events_ts(ev))
            .groupBy(
                F.date_trunc("hour", "event_time").alias("ws"), "event_type"
            )
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        ).collect()
    }
    assert set(got) == set(exp)
    for key, (n, s) in got.items():
        assert exp[key][0] == n


def test_windowed_counts_match_batch(spark, sf_small):
    stream = read_events_stream(spark, sf_small)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    # append mode only emits windows the watermark has passed; with a
    # single file the final windows stay open, so use update->complete
    # semantics via a second pass in batch for the oracle and compare on
    # the closed prefix
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_counts")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    exp_all = {
        (r["ws"], r["event_type"]): (r["n"], r["s"])
        for r in (
            ev.withColumn("event_time", events_ts(ev))
            .groupBy(
                F.date_trunc("hour", "event_time").alias("ws"), "event_type"
            )
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        ).collect()
    }
    assert got, "no closed windows emitted"
    for key, (n, s) in got.items():
        assert exp_all[key][0] == n
        assert exp_all[key][1] == pytest.approx(s)


def test_streaming_dedup_drops_duplicates(spark, sf_small):
    stream = read_events_stream(spark, sf_small)
    dup = stream.unionByName(stream)  # every event twice
    # dedup is exactly-once only within the lateness horizon; the two
    # copies arrive in different micro-batches, so the horizon must span
    # the data (30 days) for the duplicate of the newest event too
    out = streaming_dedup(dup, keys=["event_id"], watermark="2000 hours")
    _run_to_memory(out.select("event_id"), "dedup_out")
    rows = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_out").first()
    ev_n = spark.read.parquet(f"{sf_small}/events.parquet").count()
    assert rows["n"] == rows["d"] == ev_n


def test_streaming_ingest_vectors(spark, tmp_path):
    rng = np.random.default_rng(1)
    src = tmp_path / "incoming"
    src.mkdir()
    batches = []
    for b in range(3):
        rows = [
            (b * 10 + i, rng.random(8).astype(np.float32).tolist())
            for i in range(10)
        ]
        df = spark.createDataFrame(rows, "id long, embedding array<float>")
        df.coalesce(1).write.mode("append").parquet(str(src))
        batches.append(rows)

    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    store = cat.create_store("stream", "m", dimension=8)
    stream = (
        spark.readStream.schema("id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = streaming_ingest_vectors(
        stream, store, str(tmp_path / "ckpt"),
        operations_log=str(tmp_path / "ops"),
    )
    q.processAllAvailable()
    q.stop()
    assert store.count() == 30
    # progress surface exists (reference T1 analog)
    assert q.lastProgress is not None
    # durable operations log: one row per batch, totals add up
    ops = spark.read.parquet(str(tmp_path / "ops"))
    assert ops.count() == 3
    assert sum(r["rows_added"] for r in ops.collect()) == 30
    # ingested rows are queryable
    first_vec = batches[0][0][1]
    hit = store.query(first_vec, k=1).first()
    assert hit["id"] == 0


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState: running per-user totals accumulate across
    micro-batches and the final emission matches the batch oracle."""
    import numpy as np
    from mlx_vector_db_spark.streaming.stateful import running_user_totals

    rng = np.random.default_rng(4)
    src = tmp_path / "ev"
    src.mkdir()
    rows_all = []
    for b in range(3):
        rows = [
            (b * 100 + i, int(rng.integers(0, 5)), float(rng.random() * 10))
            for i in range(50)
        ]
        spark.createDataFrame(
            rows, "event_id long, user_id long, value double"
        ).coalesce(1).write.mode("append").parquet(str(src))
        rows_all += rows

    stream = (
        spark.readStream.schema("event_id long, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = running_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # the LAST emission per user holds the full running totals
    final = {
        r["user_id"]: r
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER "
            "(PARTITION BY user_id ORDER BY n_events DESC) rn "
            "FROM running_totals) WHERE rn = 1"
        ).collect()
    }
    import collections
    exp = collections.defaultdict(lambda: [0, 0.0, float("-inf")])
    for _, u, v in rows_all:
        exp[u][0] += 1
        exp[u][1] += v
        exp[u][2] = max(exp[u][2], v)
    assert set(final) == set(exp)
    for u, (n, tot, mx) in exp.items():
        assert final[u]["n_events"] == n
        assert final[u]["total_value"] == pytest.approx(tot, abs=1e-9)
        assert final[u]["max_value"] == pytest.approx(mx, abs=1e-9)
    # state really accumulated across batches (3 emissions per user)
    n_emissions = spark.sql("SELECT count(*) FROM running_totals").first()[0]
    assert n_emissions > len(exp)


def test_interval_join_stream_matches_batch(spark, sf_small):
    """Stream-stream interval join (view→purchase within 1h per user)
    emits exactly the batch twin's pairs — inner interval joins emit on
    match, so with processAllAvailable every pair must appear."""
    from mlx_vector_db_spark.streaming.ingest import interval_join

    stream = read_events_stream(spark, sf_small)
    q = (
        interval_join(stream, within="1 hour", watermark="2000 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.left_id, r.right_id, r.secs_between)
        for r in spark.sql("SELECT * FROM attrib").collect()
    }
    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    batch = ev.withColumn("event_time", events_ts(ev))
    exp = {
        (r.user_id, r.left_id, r.right_id, r.secs_between)
        for r in interval_join(batch, within="1 hour").collect()
    }
    assert exp, "batch twin produced no pairs — fixture too small"
    assert got == exp


def test_session_window_matches_batch_sessionization(spark, sf_small):
    """Native session_window sessions match the batch lag+cumsum
    sessionization on closed sessions (same 30-minute gap rule)."""
    from mlx_vector_db_spark.streaming.ingest import session_windows
    from mlx_vector_db_spark.queries import q_events_sessionize

    stream = read_events_stream(spark, sf_small)
    q = (
        session_windows(stream, gap="30 minutes", watermark="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        # batch sessionization keys on floored epoch seconds
        (r["user_id"], int(r["session_start"].timestamp())): (
            r["n_events"],
            round(r["session_value"], 4),
        )
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert got, "no closed sessions emitted"
    exp = {
        (r["user_id"], int(r["session_start"])): (r["n_events"], r["session_value"])
        for r in q_events_sessionize(spark, sf_small).collect()
    }
    # every closed streaming session matches a batch session exactly
    matched = 0
    for key, val in got.items():
        if key in exp:
            assert exp[key] == val
            matched += 1
    assert matched >= len(got) * 0.9  # tail sessions may still be open


@pytest.mark.parametrize("encoding", ["nanos", "ntz_micros", "utc_micros"])
def test_stream_batch_event_time_parity_all_encodings(spark, tmp_path, encoding):
    """The events `ts` column has shipped as INT64 nanos, NTZ micros, and
    zoned micros across test-data generations. A hardcoded stream schema
    silently emits NULL rows on mismatch (file sources don't validate),
    which once took down the whole streaming suite — so assert batch and
    stream read IDENTICAL event_time values for every physical encoding."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    stamps = [base + datetime.timedelta(minutes=17 * i) for i in range(40)]
    if encoding == "nanos":
        ts_arr = pa.array(stamps, type=pa.timestamp("ns"))
    elif encoding == "ntz_micros":
        ts_arr = pa.array(stamps, type=pa.timestamp("us"))
    else:
        ts_arr = pa.array(stamps, type=pa.timestamp("us", tz="UTC"))
    table = pa.table(
        {
            "event_id": pa.array(range(40), type=pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([i % 5 for i in range(40)], type=pa.int64()),
            "event_type": pa.array(["view"] * 40),
            "value": pa.array([float(i) for i in range(40)]),
            "props": pa.array(["{}"] * 40),
        }
    )
    path = tmp_path / encoding
    path.mkdir()
    pq.write_table(table, path / "events.parquet")

    ev = spark.read.parquet(str(path / "events.parquet"))
    batch_times = sorted(
        r[0] for r in ev.select(events_ts(ev).alias("event_time")).collect()
    )
    stream = read_events_stream(spark, str(path))
    _run_to_memory(
        stream.select("event_id", "event_time"), f"parity_{encoding}"
    )
    rows = spark.sql(f"SELECT event_time FROM parity_{encoding}").collect()
    stream_times = sorted(r[0] for r in rows)
    assert len(stream_times) == 40
    assert all(t is not None for t in stream_times), "NULL event_time from stream"
    assert stream_times == batch_times
    # and the canonical wall-clock values are right (UTC session tz)
    assert stream_times[0] == base
    assert stream_times[1] - stream_times[0] == datetime.timedelta(minutes=17)


def test_streaming_upsert_vectors(spark, tmp_path):
    from mlx_vector_db_spark.streaming import streaming_upsert_vectors

    src = tmp_path / "updates"
    src.mkdir()
    # batch 0: ids 0..9 with marker value 0.0; batch 1 rewrites ids 0..4
    # with marker 1.0 and adds ids 10..11 (one id duplicated in-batch —
    # last write wins)
    b0 = [(i, [float(i), 0.0]) for i in range(10)]
    b1 = [(i, [float(i), 1.0]) for i in range(5)] + [
        (10, [10.0, 1.0]),
        (11, [99.0, 0.5]),
        (11, [11.0, 1.0]),  # later duplicate must win
    ]
    for rows in (b0, b1):
        spark.createDataFrame(rows, "id long, embedding array<float>").coalesce(
            1
        ).write.mode("append").parquet(str(src))

    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    store = cat.create_store("ups", "m", dimension=2)
    stream = (
        spark.readStream.schema("id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = streaming_upsert_vectors(stream, store, str(tmp_path / "ckpt-ups"))
    q.processAllAvailable()
    q.stop()

    rows = {r["id"]: list(r["embedding"]) for r in store.to_df().collect()}
    assert len(rows) == 12                      # converged: no duplicates
    assert rows[3] == [3.0, 1.0]                # updated by batch 1
    assert rows[7] == [7.0, 0.0]                # untouched
    assert rows[11] == [11.0, 1.0]              # in-batch last write won


def test_ingest_batch_idempotent_and_job_status(spark, tmp_path):
    """The operations log is the commit ledger: a replayed epoch_id is a
    no-op (at-least-once foreachBatch -> effectively exactly-once), and
    job_status exposes the durable per-operation aggregate the reference
    kept in a process dict (api/routes/batch_v1.py:103-172)."""
    from mlx_vector_db_spark.streaming import ingest_batch, job_status

    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    store = cat.create_store("idem", "m", dimension=4)
    ops = str(tmp_path / "ops")
    batch = spark.createDataFrame(
        [(i, [float(i), 0.0, 0.0, 0.0]) for i in range(5)],
        "id long, embedding array<float>",
    )
    seen: set = set()
    assert ingest_batch(store, batch, 0, "job1", ops, seen) == 5
    # same epoch replayed (simulates a foreachBatch retry): no-op
    assert ingest_batch(store, batch, 0, "job1", ops, seen) == 0
    assert store.count() == 5
    # a fresh run (restart) re-reads the ledger from disk (seen_epochs
    # omitted -> ingest_batch snapshots the log itself) and still skips
    assert ingest_batch(store, batch, 0, "job1", ops) == 0
    assert store.count() == 5
    # a SECOND store sharing the same log must NOT be skipped by the
    # first store's epochs (ledger keys on (operation, store))
    store2 = cat.create_store("idem2", "m", dimension=4)
    assert ingest_batch(store2, batch, 0, "job1", ops) == 5
    assert store2.count() == 5
    status = {r["store"]: r for r in job_status(spark, ops).collect()}
    assert len(status) == 2
    row = status["idem_m"]
    assert row["operation"] == "job1" and row["status"] == "completed"
    assert row["n_batches"] == 1 and row["rows_total"] == 5 and row["n_failures"] == 0


def test_ingest_batch_failed_attempt_logged_and_retryable(spark, tmp_path):
    """A failed add logs status='failed' (visible in job_status) and the
    epoch stays retryable — failed rows never count as commits."""
    from mlx_vector_db_spark.streaming import ingest_batch, job_status

    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    store = cat.create_store("flaky", "m", dimension=4)
    ops = str(tmp_path / "ops")
    bad = spark.createDataFrame(
        [(0, [1.0, 2.0])], "id long, embedding array<float>"  # wrong dim
    )
    with pytest.raises(ValueError, match="dimension"):
        ingest_batch(store, bad, 0, "jobf", ops)
    good = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0])], "id long, embedding array<float>"
    )
    # the retried epoch is NOT skipped (the failed row is not a commit)
    assert ingest_batch(store, good, 0, "jobf", ops) == 1
    row = job_status(spark, ops, "jobf").first()
    assert row["n_failures"] == 1 and row["n_batches"] == 1
    assert row["status"] == "had_failures"


def test_streaming_knn_matches_batch(spark, tmp_path):
    """Stream of query vectors answered against a store: the union of all
    micro-batch results equals the one-shot batch_query over the same
    query set, with per-epoch provenance."""
    from mlx_vector_db_spark.streaming import streaming_knn_scores

    rng = np.random.default_rng(11)
    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    store = cat.create_store("sk", "m", dimension=8)
    vecs = rng.random((60, 8)).astype(np.float32)
    store.add_vectors(vecs.tolist(), ids=list(range(60)))

    src = tmp_path / "queries"
    src.mkdir()
    all_q = []
    for b in range(3):
        rows = [(b * 10 + i, vecs[b * 20 + i].tolist()) for i in range(5)]
        spark.createDataFrame(
            rows, "query_id long, embedding array<float>"
        ).coalesce(1).write.mode("append").parquet(str(src))
        all_q += rows

    stream = (
        spark.readStream.schema("query_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sink = str(tmp_path / "scores")
    q = streaming_knn_scores(
        stream, store, str(tmp_path / "ckpt-knn"), sink, k=3
    )
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(sink)
    # provenance: three epochs, 5 queries * k=3 rows each
    assert got.select("epoch_id").distinct().count() == 3
    got_rows = {
        (r["query_id"], r["id"], r["rank"]) for r in got.collect()
    }
    batch_q = spark.createDataFrame(
        all_q, "query_id long, embedding array<float>"
    )
    exp_rows = {
        (r["query_id"], r["id"], r["rank"])
        for r in store.batch_query(batch_q, k=3).collect()
    }
    assert got_rows == exp_rows
    # every query's rank-1 hit is its own source vector (exact cosine)
    top = {r["query_id"]: r["id"] for r in got.collect() if r["rank"] == 1}
    for (qid, _vec), (b, i) in zip(
        all_q, [(b, i) for b in range(3) for i in range(5)]
    ):
        assert top[qid] == b * 20 + i


def test_streaming_knn_sink_idempotent_on_epoch_replay(spark, tmp_path):
    """foreachBatch is at-least-once: replaying an epoch must replace its
    partition, not double-append (dynamic partition overwrite)."""
    from mlx_vector_db_spark.streaming import score_knn_batch

    rng = np.random.default_rng(13)
    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    store = cat.create_store("idems", "m", dimension=4)
    vecs = rng.random((10, 4)).astype(np.float32)
    store.add_vectors(vecs.tolist(), ids=list(range(10)))
    batch = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(4)],
        "query_id long, embedding array<float>",
    )
    sink = str(tmp_path / "scores")
    score_knn_batch(store, batch, 0, sink, k=2)
    n_first = spark.read.parquet(sink).count()
    score_knn_batch(store, batch, 0, sink, k=2)   # replayed epoch
    got = spark.read.parquet(sink)
    assert got.count() == n_first == 8            # 4 queries * k=2, once
    # a NEW epoch still appends alongside
    score_knn_batch(store, batch, 1, sink, k=2)
    assert spark.read.parquet(sink).count() == 16
    assert spark.read.parquet(sink).select("epoch_id").distinct().count() == 2


def test_streaming_ingest_dedup_on_write(spark, tmp_path):
    """dedup_threshold screens each micro-batch against the store: a
    second file repeating the first file's vectors adds nothing; novel
    vectors still land."""
    rng = np.random.default_rng(7)
    src = tmp_path / "incoming"
    src.mkdir()
    base = [(i, rng.random(8).astype(np.float32).tolist()) for i in range(10)]
    novel = [
        (100 + i, (-np.array(v, dtype=np.float32)).tolist()) for i, (_, v) in enumerate(base[:4])
    ]
    spark.createDataFrame(base, "id long, embedding array<float>").coalesce(1)\
        .write.mode("append").parquet(str(src))
    spark.createDataFrame(base[:6] + novel, "id long, embedding array<float>")\
        .coalesce(1).write.mode("append").parquet(str(src))

    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    store = cat.create_store("stream", "dedup", dimension=8)
    stream = (
        spark.readStream.schema("id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = streaming_ingest_vectors(
        stream, store, str(tmp_path / "ckpt"), dedup_threshold=0.999
    )
    q.processAllAvailable()
    q.stop()
    # 10 from batch 1 + only the 4 novel rows from batch 2
    assert store.count() == 14


def test_streaming_ingest_concurrent_with_optimize_and_vacuum(spark, tmp_path):
    """End-to-end CAS composition (the scenario the r6 optimistic
    concurrency machinery exists for): a REAL micro-batch ingest stream
    appends through foreachBatch WHILE a maintenance thread on a
    separate store handle runs optimize() + vacuum() in a loop. Zero
    lost epochs: every batch's rows land (the append CAS loop folds
    around the compactor's swaps, and the compactor's CAS re-read folds
    in files appended mid-rewrite), the idempotency ledger records every
    epoch completed, and the store stays queryable afterwards."""
    import threading
    import time as _time

    from mlx_vector_db_spark.streaming.ingest import job_status

    rng = np.random.default_rng(11)
    src = tmp_path / "incoming"
    src.mkdir()
    n_batches, rows_per = 10, 20
    for b in range(n_batches):
        rows = [
            (b * rows_per + i, rng.random(8).astype(np.float32).tolist())
            for i in range(rows_per)
        ]
        spark.createDataFrame(rows, "id long, embedding array<float>").coalesce(
            1
        ).write.mode("append").parquet(str(src))

    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    store = cat.create_store("concur", "m", dimension=8)
    # maintenance job on its OWN handle, as in production (different
    # snapshot view; only the manifest protocol coordinates them)
    maint = cat.get_store("concur", "m")
    stop = threading.Event()
    compactions: list[int] = []
    errors: list[BaseException] = []

    def compactor() -> None:
        while not stop.is_set():
            try:
                if maint.count() > 0:
                    compactions.append(maint.optimize(target_files=2))
                    # min_age 10s: reaps superseded manifests from
                    # earlier iterations without racing the ingest's
                    # in-flight (written-but-uncommitted) append files
                    cat.vacuum(min_age_seconds=10)
            except BaseException as exc:  # noqa: BLE001 — surfaced below
                errors.append(exc)
                return
            _time.sleep(0.05)

    t = threading.Thread(target=compactor, daemon=True)
    t.start()
    try:
        stream = (
            spark.readStream.schema("id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = streaming_ingest_vectors(
            stream,
            store,
            str(tmp_path / "ckpt"),
            operations_log=str(tmp_path / "ops"),
        )
        q.processAllAvailable()
        q.stop()
    finally:
        stop.set()
        t.join(timeout=60)
    assert not errors, f"maintenance loop died: {errors[0]!r}"
    assert compactions, "optimize never ran concurrently with the stream"

    # zero lost epochs: every row of every batch is in the final
    # manifest despite the interleaved rewrites
    final = cat.get_store("concur", "m")
    assert final.count() == n_batches * rows_per
    ids = {r["id"] for r in final.to_df().select("id").collect()}
    assert ids == set(range(n_batches * rows_per))
    # ledger: all epochs committed exactly once, no failures recorded
    status = job_status(spark, str(tmp_path / "ops"), "vector_ingest").first()
    assert status["n_batches"] == n_batches
    assert status["rows_total"] == n_batches * rows_per
    assert status["status"] == "completed"
    # lifecycle stays green: the compacted+appended store answers queries
    probe = final.to_df().select("embedding").first()["embedding"]
    assert final.query(probe, k=1).count() == 1


def test_streaming_ingest_inline_compaction(spark, tmp_path):
    """compact_max_files keeps the store's file count bounded across a
    many-batch stream (one parquet file lands per micro-batch without
    it) while every row still arrives exactly once."""
    rng = np.random.default_rng(13)
    src = tmp_path / "incoming"
    src.mkdir()
    n_batches, rows_per = 12, 5
    for b in range(n_batches):
        rows = [
            (b * rows_per + i, rng.random(8).astype(np.float32).tolist())
            for i in range(rows_per)
        ]
        spark.createDataFrame(rows, "id long, embedding array<float>").coalesce(
            1
        ).write.mode("append").parquet(str(src))
    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    store = cat.create_store("compact", "m", dimension=8)
    stream = (
        spark.readStream.schema("id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = streaming_ingest_vectors(
        stream, store, str(tmp_path / "ckpt"),
        operations_log=str(tmp_path / "ops"),
        compact_max_files=4,
    )
    q.processAllAvailable()
    q.stop()
    n_files = len(store._data_files())
    assert n_files <= 4 + 1, f"{n_files} files survived inline compaction"
    assert store.count() == n_batches * rows_per
    ids = {r["id"] for r in store.to_df().select("id").collect()}
    assert ids == set(range(n_batches * rows_per))


def test_streaming_maxsim_matches_batch(spark, tmp_path):
    """r12: a stream of multi-vector (token) queries answered against
    the store's TOKEN tier — the union of all micro-batch results
    equals the one-shot maxsim_query over the same query set, with
    per-epoch provenance. One query set per file (the micro-batch
    completeness contract)."""
    from mlx_vector_db_spark.streaming import streaming_maxsim_scores

    rng = np.random.default_rng(17)
    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    store = cat.create_store("smx", "tok", dimension=8)
    tok_rows = [
        (d, rng.normal(size=8).astype(float).tolist())
        for d in range(30)
        for _ in range(3)
    ]
    docs = spark.createDataFrame(
        tok_rows, "doc_id long, embedding array<float>"
    )
    store.add_token_vectors(docs)

    src = tmp_path / "qtok"
    all_q = []
    for b in range(3):
        rows = [
            (b, t)
            for (d, t) in tok_rows
            if d == b  # query b = doc b's token set (self-match truth)
        ]
        spark.createDataFrame(
            rows, "query_id long, embedding array<float>"
        ).coalesce(1).write.mode("append").parquet(str(src))
        all_q += rows

    stream = (
        spark.readStream.schema("query_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sink = str(tmp_path / "mscores")
    q = streaming_maxsim_scores(
        stream, store, str(tmp_path / "ckpt-mx"), sink, k=3
    )
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(sink)
    assert got.select("epoch_id").distinct().count() == 3
    got_rows = {
        (r["query_id"], r["doc_id"], r["rank"]) for r in got.collect()
    }
    batch_q = spark.createDataFrame(
        all_q, "query_id long, embedding array<float>"
    )
    exp_rows = {
        (r["query_id"], r["doc_id"], r["rank"])
        for r in store.maxsim_query(batch_q, k=3).collect()
    }
    assert got_rows == exp_rows
    top = {r["query_id"]: r["doc_id"] for r in got.collect() if r["rank"] == 1}
    assert top == {0: 0, 1: 1, 2: 2}


def test_streaming_maxsim_sink_idempotent_on_epoch_replay(spark, tmp_path):
    """Replaying a maxsim epoch replaces its partition, not
    double-appends (the score_knn_batch delivery guarantee)."""
    from mlx_vector_db_spark.streaming import score_maxsim_batch

    rng = np.random.default_rng(19)
    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    store = cat.create_store("idemx", "tok", dimension=4)
    docs = spark.createDataFrame(
        [
            (d, rng.normal(size=4).astype(float).tolist())
            for d in range(8)
            for _ in range(2)
        ],
        "doc_id long, embedding array<float>",
    )
    store.add_token_vectors(docs)
    batch = docs.where(F.col("doc_id") < 2).withColumnRenamed(
        "doc_id", "query_id"
    )
    sink = str(tmp_path / "sink")
    score_maxsim_batch(store, batch, 7, sink, k=2)
    once = spark.read.parquet(sink).count()
    score_maxsim_batch(store, batch, 7, sink, k=2)  # replay epoch 7
    again = spark.read.parquet(sink)
    assert again.count() == once
    assert [r["epoch_id"] for r in again.select("epoch_id").distinct().collect()] == [7]
