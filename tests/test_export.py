"""Deterministic export/sharding sink."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.sources.export import (
    export_shards,
    read_shards,
    shard_id,
    shuffle_key,
)


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
    )


def test_shard_assignment_deterministic_and_partition_invariant(spark):
    df = _docs(spark)
    a = {r.doc_id: r.s for r in df.select("doc_id", shard_id("doc_id", 8).alias("s")).collect()}
    b = {
        r.doc_id: r.s
        for r in df.repartition(17)
        .select("doc_id", shard_id("doc_id", 8).alias("s"))
        .collect()
    }
    assert a == b
    assert set(a.values()) == set(range(8))  # all shards populated at n=200


def test_export_parquet_roundtrip_and_manifest(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "out")
    manifest = export_shards(df, path, n_shards=4)
    m = {r.shard: r.n_rows for r in manifest.collect()}
    assert sum(m.values()) == 200 and len(m) == 4
    # shard directories exist
    assert sorted(os.path.basename(p) for p in glob.glob(f"{path}/shard=*")) == [
        "shard=0", "shard=1", "shard=2", "shard=3",
    ]
    back = read_shards(spark, path)
    assert back.count() == 200
    # persisted manifest matches
    m2 = {r.shard: r.n_rows for r in spark.read.parquet(f"{path}/_manifest").collect()}
    assert m2 == m


def test_export_shard_pruning(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "out")
    export_shards(df, path, n_shards=4)
    only2 = read_shards(spark, path, shards=[2])
    rows = only2.collect()
    assert all(r.shard == 2 for r in rows)
    expect = df.where(shard_id("doc_id", 4) == 2).count()
    assert len(rows) == expect


def test_epoch_order_deterministic_and_differs_by_epoch(spark, tmp_path):
    df = _docs(spark, 50)
    p0 = str(tmp_path / "e0")
    p0b = str(tmp_path / "e0b")
    p1 = str(tmp_path / "e1")
    export_shards(df, p0, n_shards=1, epoch=0)
    export_shards(df, p0b, n_shards=1, epoch=0)
    export_shards(df, p1, n_shards=1, epoch=1)
    order0 = [r.doc_id for r in spark.read.parquet(p0).collect()]
    order0b = [r.doc_id for r in spark.read.parquet(p0b).collect()]
    order1 = [r.doc_id for r in spark.read.parquet(p1).collect()]
    assert order0 == order0b  # same epoch -> identical file order
    assert sorted(order0) == sorted(order1)
    assert order0 != order1  # different epoch -> different shuffle
    # and matches the declared shuffle key
    expect = [
        r.doc_id
        for r in df.withColumn("k", shuffle_key("doc_id", 0))
        .orderBy("k", "doc_id")
        .collect()
    ]
    assert order0 == expect


def test_export_jsonl(spark, tmp_path):
    df = _docs(spark, 30)
    path = str(tmp_path / "jl")
    manifest = export_shards(df, path, n_shards=2, fmt="jsonl")
    assert sum(r.n_rows for r in manifest.collect()) == 30
    files = glob.glob(f"{path}/shard=*/part-*")
    assert files and all(not f.endswith(".parquet") for f in files)
    with open(files[0]) as fh:
        first = fh.readline()
    assert first.startswith("{") and '"text"' in first
    assert read_shards(spark, path, fmt="jsonl").count() == 30


def test_max_records_per_file(spark, tmp_path):
    df = _docs(spark, 100)
    path = str(tmp_path / "mrf")
    export_shards(df, path, n_shards=1, max_records_per_file=10)
    files = glob.glob(f"{path}/shard=0/part-*.parquet")
    assert len(files) >= 10


def test_export_validates_args(spark, tmp_path):
    df = _docs(spark, 5)
    with pytest.raises(ValueError):
        export_shards(df, str(tmp_path / "x"), n_shards=0)
    with pytest.raises(ValueError):
        export_shards(df, str(tmp_path / "x"), n_shards=2, fmt="csv")
    with pytest.raises(ValueError):
        export_shards(df, str(tmp_path / "x"), n_shards=2, id_col="nope")
