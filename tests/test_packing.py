"""Token-budget packing invariants on the real documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.functions.text import token_count
from mlx_vector_db_spark.operators.packing import greedy_pack


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    d = spark.read.parquet(f"{sf_small}/documents.parquet")
    return d.withColumn("n_tokens", token_count("text")).cache()


def test_bins_respect_budget(spark, docs):
    budget = 200
    packed = greedy_pack(docs, "n_tokens", budget)
    rows = packed.collect()
    assert len(rows) == docs.count()  # every doc assigned exactly once
    sums = (
        packed.where(~F.col("oversize"))
        .groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    )
    assert sums and all(r["total"] <= budget for r in sums)


def test_oversize_docs_isolated(spark, docs):
    budget = 40  # below many docs' token counts
    packed = greedy_pack(docs, "n_tokens", budget).cache()
    over = packed.where(F.col("oversize"))
    assert over.count() > 0
    # each oversize doc is alone in its bin
    per_bin = over.groupBy("bin_id").count().collect()
    assert all(r["count"] == 1 for r in per_bin)
    # oversize bins never shared with normal docs
    shared = (
        packed.groupBy("bin_id")
        .agg(F.countDistinct("oversize").alias("kinds"))
        .where("kinds > 1")
        .count()
    )
    assert shared == 0


def test_pack_by_group_never_mixes(spark, docs):
    packed = greedy_pack(docs, "n_tokens", 300, by="lang")
    mixed = (
        packed.groupBy("bin_id")
        .agg(F.countDistinct("lang").alias("n_langs"))
        .where("n_langs > 1")
        .count()
    )
    assert mixed == 0


def test_bad_args(spark, docs):
    with pytest.raises(ValueError, match="budget"):
        greedy_pack(docs, "n_tokens", 0)
    with pytest.raises(ValueError, match="token_col"):
        greedy_pack(docs, "nope", 10)
