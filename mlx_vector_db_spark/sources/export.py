"""Training-data export: deterministic sharding, epoch shuffling, and
sharded sinks (parquet / jsonl).

The last stage of a data pipeline is writing tokenizer-ready shards
that (a) are reproducible — the same corpus must produce the same
shard membership and intra-shard order on any cluster size, any
engine, any retry — and (b) have bounded file sizes so downstream
loaders can stream them. Spark's default output (one file per task,
hash-partitioned by whatever the last shuffle was) gives neither.

Determinism comes from the same engine-portable md5 keying the
sampling operators use (:func:`~mlx_vector_db_spark.operators.
sampling.sample_key`): shard id = first 8 md5 hex digits of the row id
mod n_shards, intra-shard order = (shuffle key, id). No RNG state, no
partition-index dependence.

Scale (100 TB): one shuffle (``repartition`` on the shard column) +
partition-local sort; ``maxRecordsPerFile`` caps file sizes without a
second job. ``partitionBy`` writes ``shard=N/`` directories so a
loader can read any subset with partition pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["shard_id", "shuffle_key", "export_shards", "read_shards"]


def shard_id(id_col: Column | str, n_shards: int, salt: str = "") -> Column:
    """Deterministic shard assignment in [0, n_shards): first 8 md5 hex
    digits of (salt || id), mod n_shards. Engine-portable and stable
    under repartitioning — the property retries and re-runs need."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1 (got {n_shards})")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    hx = F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8)
    return (F.conv(hx, 16, 10).cast("long") % F.lit(n_shards)).cast("int")


def shuffle_key(id_col: Column | str, epoch: int = 0) -> Column:
    """Deterministic 'random' order key for epoch shuffling: md5 of
    (epoch || id). Different epochs give independent-looking orders;
    the same epoch gives the same order everywhere."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(F.lit(f"epoch{epoch}:"), c.cast("string")))


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    fmt: str = "parquet",
    epoch: int = 0,
    salt: str = "",
    max_records_per_file: int | None = None,
    compression: str | None = None,
) -> DataFrame:
    """Write ``df`` as ``n_shards`` deterministic shards under
    ``path/shard=N/``, each internally ordered by the epoch shuffle
    key. Returns the per-shard manifest (shard, n_rows) — also written
    to ``path/_manifest`` so a loader can verify completeness.

    ``fmt``: ``parquet`` (default) or ``jsonl`` (newline-delimited
    JSON via Spark's json sink — the interchange format tokenizer
    pipelines expect).

    Plan: ONE shuffle (repartition by shard) + partition-local sort;
    shard directories come from ``partitionBy``, file-size bounds from
    ``maxRecordsPerFile`` — no second pass, no driver loop.
    """
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt must be parquet|jsonl (got {fmt!r})")
    if id_col not in df.columns:
        raise ValueError(f"id_col {id_col!r} not in {df.columns}")
    out = (
        df.withColumn("shard", shard_id(id_col, n_shards, salt))
        .withColumn("_key", shuffle_key(id_col, epoch))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_key", id_col)
        .drop("_key")
    )
    writer = out.write.mode("overwrite").partitionBy("shard")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if compression is not None:
        writer = writer.option("compression", compression)
    if fmt == "jsonl":
        writer.json(path)
    else:
        writer.parquet(path)
    spark = df.sparkSession
    manifest = (
        (spark.read.json(path) if fmt == "jsonl" else spark.read.parquet(path))
        .groupBy("shard")
        .agg(F.count("*").cast("long").alias("n_rows"))
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}/_manifest")
    return manifest


def read_shards(spark, path: str, fmt: str = "parquet", shards: list[int] | None = None):
    """Read an exported dataset back; ``shards`` prunes to specific
    shard directories (partition pruning — only those directories are
    listed/scanned)."""
    df = spark.read.json(path) if fmt == "jsonl" else spark.read.parquet(path)
    if shards is not None:
        df = df.where(F.col("shard").isin([int(s) for s in shards]))
    return df
