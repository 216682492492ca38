"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]``; the same config block is what we would
ship to a 1000-executor cluster — AQE handles runtime re-planning
(partition coalescing, skew-join splitting), Arrow is on for every
Pandas-UDF boundary, and the session timezone is pinned to UTC so results
hash-match a DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "mlx_vector_db_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``SPARK_GRAFT_CPUS`` selects local parallelism (default all cores).
    ``spark.sql.shuffle.partitions`` defaults to the core count — at
    cluster scale this would instead be sized so each shuffle partition
    stays in the 100-200 MB range; AQE coalescing makes the exact number
    less critical.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    n_shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Broadcast policy (the sf100 checkpoint's lesson, both ways):
        # hard-coded broadcast() hints on sf-scaling dimensions force a
        # 15M-row build at sf100, but Spark's 10 MB default then flips
        # the same join to a 600M-row sort-merge — measured 143s vs 60s
        # on TPC-H Q3 shape. Raise the RUNTIME (actual-size, post-
        # filter) threshold so a ~100 MB dimension broadcasts at any
        # scale; keep the static (estimate-based) threshold conservative
        # since pre-AQE estimates ignore filters. On a 1000-executor
        # cluster a 128 MB broadcast is ~128 GB of network — still far
        # cheaper than shuffling the 100 TB fact side.
        # MEMORY PREREQUISITE: a runtime-converted broadcast build of
        # up to 128 MB serialized deserializes to a several-fold larger
        # HashedRelation that must fit on the driver AND every
        # executor. The 8g driver default below clears that with
        # headroom; if you LOWER SPARK_GRAFT_DRIVER_MEM below ~4g,
        # lower this threshold with it (extra_conf) or runtime
        # broadcasts can OOM the driver.
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "128m")
        # lazy localCheckpoints (signature reuse, pushdown fences) are
        # freed by the ContextCleaner only after their RDDs are
        # garbage-collected; the default periodic driver GC is 30min,
        # long enough for a many-query session to OOM on pinned blocks
        # (observed at the sf10 scale checkpoint). 5min bounds the lag;
        # long pipelines can also call release_intermediates().
        .config("spark.cleaner.periodicGC.interval", "5min")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # bucketed tables (saveAsTable) need a warehouse; keep it out of
        # the repo working tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/mlx_vector_db_spark-warehouse"),
        )
        # the events table carries TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects; read as raw nanos and convert explicitly
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # 32 MB parquet row groups on every table this engine WRITES
        # (default 128 MB). Vector rows are wide (~300 B at dim 64,
        # 32 KB packed tokens), so a 128 MB row group is one
        # unsplittable unit of up to ~400k rows: (a) byte-range file
        # splits collapse onto whichever task owns the row-group
        # midpoint — measured r12 at 100k queries x 2M rows, a 5-file
        # store planned 32 splits but FOUR tasks carried 484k rows each
        # while 28 read nothing, serializing the 25-TFLOP blocked sweep
        # 4-way (the partition-count rebalance probe can't see it: the
        # count was 32); (b) the vectorized reader decodes up to one
        # row group per batch, OOMing small heaps on packed rows (the
        # token-tier finding, store._TOKEN_PARQUET_BLOCK). 32 MB keeps
        # row groups large enough for columnar compression and scan
        # throughput while letting splits and reader batches stay
        # balanced and bounded on any cluster.
        .config("spark.hadoop.parquet.block.size", str(32 * 1024 * 1024))
        # push LARGE In-sets down to parquet as the exact set instead of
        # collapsing to a min/max range (the default threshold is 10):
        # the funnel's pass-2 re-rank pushes a driver-bounded candidate
        # id list (up to n_queries * k * overfetch values) into the
        # float-table scan, and only the exact set lets row-group AND
        # page (column-index) stats prune a SCATTERED id list — a range
        # filter over scattered candidates spans the whole table and
        # prunes nothing (measured r13: the semi-join fallback read the
        # full 515 MB float table under a 150 MB/s throttle).
        .config("spark.sql.parquet.pushdown.inFilterThreshold", "131072")
        # the pushed In predicate's parquet evaluation recurses per
        # value: at the default 1 MB thread stack it overflows from
        # ~1.2k values (measured: 1100 OK / 1500 StackOverflowError,
        # nondeterministic near the edge). 16 MB stacks carry 16k
        # values with headroom (measured OK; 32k fails on planning
        # allocation pressure instead — the funnel caps its pushdown at
        # 16384, operators/maxsim._FUNNEL_PUSHDOWN_LIMIT). Stacks are
        # lazily faulted, so the cost is virtual address space only.
        # On a real cluster the executor opt is the one that matters;
        # both are set so local[*] (driver-hosted executors) and
        # deployed executors agree.
        .config("spark.driver.extraJavaOptions", "-Xss16m")
        .config("spark.executor.extraJavaOptions", "-Xss16m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _silence_bounded_window_warn(spark)
    return spark


def release_intermediates(spark: SparkSession) -> None:
    """Nudge reclamation of no-longer-referenced cached intermediates
    (lazy localCheckpoints from signature reuse / pushdown fences).

    Their executor blocks are freed by the ContextCleaner only after
    the backing RDDs are garbage-collected, and the JVM cannot see
    Python-side reference death: a long session running many heavy
    operators can pin gigabytes of dead blocks and OOM (observed at the
    sf10 scale checkpoint — each query fine alone, the session died
    cumulatively). Call between pipeline stages or bench queries:
    Python GC drops the py4j proxies, one JVM System.gc() lets the
    cleaner collect the now-weak RDDs. Deliberately a no-op for
    anything still referenced — this cannot invalidate a live frame.
    """
    import gc

    from mlx_vector_db_spark.operators.knn import drain_retired_caches

    drain_retired_caches()
    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # pragma: no cover — connect mode has no _jvm
        pass


def _silence_bounded_window_warn(spark: SparkSession) -> None:
    """Raise the ``WindowExec`` logger to ERROR.

    The engine's only unpartitioned windows are post-``LIMIT k`` ranks
    over results already bounded to a handful of rows
    (``operators.topk.bounded_global_rank``), where WindowExec's "No
    Partition Defined ... serious performance degradation" warning is
    noise: the single partition it moves data into holds <= k rows by
    construction. Catalyst strips constant partition keys, so the
    warning cannot be avoided at the plan level; scope the suppression
    to exactly that logger instead of lowering the global level.
    """
    try:
        jvm = spark.sparkContext._jvm
        configurator = jvm.org.apache.logging.log4j.core.config.Configurator
        level = jvm.org.apache.logging.log4j.Level.ERROR
        configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec", level
        )
    except Exception:
        pass  # logging backend not log4j2 (or shaded) — warning is cosmetic
