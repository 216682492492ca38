"""MMR diversity rerank: lambda=1 degeneracy to plain top-k, planted
near-duplicate suppression, pure-numpy greedy oracle parity, tie-break
determinism, validation.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.knn import knn_join
from mlx_vector_db_spark.operators.mmr import mmr_rerank, mmr_search

N, DIM, K = 500, 16, 5
RNG = np.random.default_rng(99)


@pytest.fixture(scope="module")
def vec_np():
    X = RNG.standard_normal((N, DIM))
    # plant: docs 1 and 2 are near-duplicates of each other AND both
    # highly relevant to query 0 (doc 0's direction)
    X[1] = X[0] + 0.05 * RNG.standard_normal(DIM)
    X[2] = X[1] + 0.02 * RNG.standard_normal(DIM)
    return X.astype(np.float32)


@pytest.fixture(scope="module")
def vectors(spark, vec_np):
    return spark.createDataFrame(
        [(i, vec_np[i].tolist()) for i in range(N)],
        "id long, embedding array<float>",
    ).cache()


@pytest.fixture(scope="module")
def queries(vectors):
    return vectors.where(F.col("id") < 3).select(
        F.col("id").alias("query_id"), "embedding"
    )


def test_lambda_one_is_plain_topk(vectors, queries):
    out = mmr_search(vectors, queries, k=K, fetch_k=4 * K, lambda_=1.0)
    exact = knn_join(vectors, queries, k=K)
    a = [(r["query_id"], r["id"]) for r in out.orderBy("query_id", "rank").collect()]
    e = [(r["query_id"], r["id"]) for r in exact.orderBy("query_id", "rank").collect()]
    assert a == e
    # and relevance carries the exact similarity
    rel = {(r["query_id"], r["id"]): r["relevance"] for r in out.collect()}
    sim = {(r["query_id"], r["id"]): r["similarity"] for r in exact.collect()}
    for key in rel:
        assert rel[key] == pytest.approx(sim[key], abs=1e-9)


def test_near_duplicates_suppressed(vectors, queries):
    """Query 0's pool has docs 0/1/2 as mutual near-duplicates at the
    top of the relevance ranking; lambda=1 keeps all three in the top-3
    while lambda=0.5 must spend at most two top-3 slots on the trio."""
    plain = mmr_search(vectors, queries, k=3, fetch_k=40, lambda_=1.0)
    mmr = mmr_search(vectors, queries, k=3, fetch_k=40, lambda_=0.5)
    trio = {0, 1, 2}
    plain_ids = {r["id"] for r in plain.where(F.col("query_id") == 0).collect()}
    mmr_ids = {r["id"] for r in mmr.where(F.col("query_id") == 0).collect()}
    assert len(plain_ids & trio) == 3  # the plant dominates plain top-3
    assert len(mmr_ids & trio) < 3  # diversity penalty breaks the wall
    assert 0 in mmr_ids  # but the most relevant doc always stays


def _numpy_mmr(ids, X, rel, k, lam):
    order = np.argsort(ids)
    ids, X, rel = ids[order], X[order], rel[order]
    U = X / np.maximum(np.linalg.norm(X, axis=1), 1e-8)[:, None]
    chosen, scores = [], []
    max_sim = np.zeros(len(ids))
    taken = np.zeros(len(ids), dtype=bool)
    for step in range(min(k, len(ids))):
        pen = max_sim if step else np.zeros(len(ids))
        mmr = lam * rel - (1 - lam) * pen
        mmr[taken] = -np.inf
        pick = int(np.argmax(mmr))
        chosen.append(ids[pick])
        scores.append(mmr[pick])
        taken[pick] = True
        max_sim = np.maximum(max_sim, U @ U[pick])
    return chosen, scores


def test_matches_numpy_oracle(vectors, queries, vec_np):
    fetch_k, lam = 30, 0.6
    cand = knn_join(vectors, queries, k=fetch_k).select(
        "query_id", "id", "similarity"
    )
    pool = cand.join(vectors, on="id")
    out = mmr_rerank(pool, k=K, lambda_=lam).orderBy("query_id", "rank")
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["id"], r["mmr_score"]))
    pool_rows = pool.collect()
    by_q = {}
    for r in pool_rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        ids = np.array([r["id"] for r in rows])
        X = np.array([r["embedding"] for r in rows], dtype=np.float64)
        rel = np.array([r["similarity"] for r in rows], dtype=np.float64)
        want_ids, want_scores = _numpy_mmr(ids, X, rel, K, lam)
        assert [i for i, _ in got[qid]] == want_ids
        for (_, s), w in zip(got[qid], want_scores):
            assert s == pytest.approx(w, abs=1e-9)


def test_rank_one_is_top_relevance(vectors, queries):
    out = mmr_search(vectors, queries, k=K, fetch_k=40, lambda_=0.3)
    exact = knn_join(vectors, queries, k=1)
    first = {r["query_id"]: r["id"] for r in out.where(F.col("rank") == 1).collect()}
    top = {r["query_id"]: r["id"] for r in exact.collect()}
    assert first == top


def test_small_pool_returns_pool_size(vectors, queries):
    out = mmr_search(vectors, queries, k=50, fetch_k=50)
    # pool is fetch_k=50 rows per query; k == pool so all come back
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 50 for r in counts)


def test_deterministic(vectors, queries):
    a = mmr_search(vectors, queries, k=K, fetch_k=40, lambda_=0.5)
    b = mmr_search(vectors, queries, k=K, fetch_k=40, lambda_=0.5)
    ra = [(r["query_id"], r["id"]) for r in a.orderBy("query_id", "rank").collect()]
    rb = [(r["query_id"], r["id"]) for r in b.orderBy("query_id", "rank").collect()]
    assert ra == rb


def test_validation(vectors, queries):
    with pytest.raises(ValueError, match="lambda_"):
        mmr_search(vectors, queries, k=K, fetch_k=40, lambda_=1.5)
    with pytest.raises(ValueError, match="fetch_k"):
        mmr_search(vectors, queries, k=10, fetch_k=5)
    with pytest.raises(ValueError, match="k must be"):
        mmr_rerank(vectors.limit(0), k=0)
