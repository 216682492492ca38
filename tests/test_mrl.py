"""Matryoshka prefix-dim retrieval: funnel recall on a decay-weighted
(MRL-like) fixture, full-overfetch exactness, prefix-column variant,
validation.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.knn import knn_join
from mlx_vector_db_spark.operators.mrl import mrl_search_batch, prefix_column

N, DIM, K, D_PREFIX = 2000, 32, 10, 8
RNG = np.random.default_rng(73)


@pytest.fixture(scope="module")
def vec_np():
    # MRL-like: per-dimension scale decays geometrically, so the first
    # D_PREFIX dims carry most of the variance — the regime the funnel
    # is FOR (an MRL-trained encoder front-loads information this way)
    decay = 0.82 ** np.arange(DIM)
    X = RNG.standard_normal((N, DIM)) * decay[None, :]
    return X.astype(np.float32)


@pytest.fixture(scope="module")
def vectors(spark, vec_np):
    return spark.createDataFrame(
        [(i, vec_np[i].tolist()) for i in range(N)],
        "id long, embedding array<float>",
    ).cache()


@pytest.fixture(scope="module")
def queries(vectors):
    return vectors.where(F.col("id") < 5).select(
        F.col("id").alias("query_id"), "embedding"
    )


def _recall(approx_rows, exact_rows):
    want, got = {}, {}
    for r in exact_rows:
        want.setdefault(r["query_id"], set()).add(r["id"])
    for r in approx_rows:
        got.setdefault(r["query_id"], set()).add(r["id"])
    assert set(got) == set(want)
    return min(len(got[q] & want[q]) for q in want)


def test_funnel_recall_on_mrl_fixture(vectors, queries):
    approx = mrl_search_batch(vectors, queries, d_prefix=D_PREFIX, k=K)
    exact = knn_join(vectors, queries, k=K)
    assert _recall(approx.collect(), exact.collect()) >= 9


def test_full_overfetch_is_exact(vectors, queries):
    approx = mrl_search_batch(
        vectors, queries, d_prefix=D_PREFIX, k=K, overfetch=(N + K - 1) // K
    )
    exact = knn_join(vectors, queries, k=K)
    a = [(r["query_id"], r["id"]) for r in approx.orderBy("query_id", "rank").collect()]
    e = [(r["query_id"], r["id"]) for r in exact.orderBy("query_id", "rank").collect()]
    assert a == e


def test_prefix_column_variant_matches_slice(vectors, queries):
    """Materialized prefix column (the IO-cut deployment) must produce
    the identical result to the in-scan slice."""
    with_prefix = prefix_column(vectors, D_PREFIX)
    via_col = mrl_search_batch(
        with_prefix, queries, d_prefix=D_PREFIX, k=K,
        prefix_col="embedding_prefix",
    )
    via_slice = mrl_search_batch(vectors, queries, d_prefix=D_PREFIX, k=K)
    a = [(r["query_id"], r["id"]) for r in via_col.orderBy("query_id", "rank").collect()]
    b = [(r["query_id"], r["id"]) for r in via_slice.orderBy("query_id", "rank").collect()]
    assert a == b


def test_prefix_column_shape(vectors):
    row = prefix_column(vectors, D_PREFIX).first()
    assert len(row["embedding_prefix"]) == D_PREFIX
    assert row["embedding_prefix"] == row["embedding"][:D_PREFIX]


def test_exact_scores_after_rerank(vectors, queries):
    """Funnel scores are FULL-vector scores, not prefix scores."""
    out = mrl_search_batch(vectors, queries, d_prefix=D_PREFIX, k=K)
    exact = knn_join(vectors, queries, k=K)
    a = {(r["query_id"], r["id"]): r["score"] for r in out.collect()}
    e = {(r["query_id"], r["id"]): r["score"] for r in exact.collect()}
    shared = set(a) & set(e)
    assert shared  # overlapping hits exist
    for key in shared:
        assert abs(a[key] - e[key]) < 1e-9


def test_validation(vectors, queries):
    with pytest.raises(ValueError, match="d_prefix"):
        mrl_search_batch(vectors, queries, d_prefix=0, k=K)
    with pytest.raises(ValueError, match="overfetch"):
        mrl_search_batch(vectors, queries, d_prefix=4, k=K, overfetch=0)
    with pytest.raises(ValueError, match="d_prefix"):
        prefix_column(vectors, 0)
