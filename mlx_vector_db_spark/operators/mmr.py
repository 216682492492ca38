"""Maximal Marginal Relevance (MMR) — diversity-aware retrieval rerank.

Carbonell & Goldstein, SIGIR 1998 (public method): given a candidate
pool per query, greedily select k documents maximizing

    mmr(d) = lambda * rel(d) - (1 - lambda) * max_{s in S} sim(d, s)

where ``rel`` is the query-document similarity and the penalty term is
the document's similarity to the already-selected set S. lambda=1
degenerates to plain top-k by relevance; lambda=0.5 is the classic
diversity point. Every serious RAG stack runs this between retrieval
and context assembly (LangChain/LlamaIndex ``mmr`` search type) — the
reference's pipeline returns raw top-k only
(integrations/mlx_lm_pipeline.py RAG flow), so this is a
beyond-reference operator on the engine's own candidate machinery.

Spark-first split: the candidate pool comes from any existing retrieval
tier (exact knn_join, IVF/PQ/BQ two-pass, hybrid RRF — anything that
yields (query_id, id) pairs), the float vectors for the POOL ONLY are
semi-joined back (fetch_k rows per query, never the corpus), and the
greedy selection runs per query group via ``applyInPandas`` — a
(fetch_k, dim) numpy problem per query, thousands of queries in
parallel, zero driver collection. The iterative step is O(k * fetch_k)
dot products on a matrix that fits in L2 cache; distributing WITHIN a
query would buy nothing and cost k shuffle barriers.

Determinism: fp64 scoring, ties broken on id ASC — the selection is a
pure function of the input rows (oracle-checked by a recursive-CTE
DuckDB replay in queries.py mmr_rerank_topk).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.knn import knn_join

__all__ = ["mmr_rerank", "mmr_search"]


def _mmr_select(
    ids: np.ndarray, X: np.ndarray, rel: np.ndarray, k: int, lam: float
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy MMR over one query's pool: returns (selected positional
    indices, their mmr scores at selection time). Cosine similarity on
    unit-normalized rows; ties broken on id ASC (argmax scans the pool
    in id order after a lexsort)."""
    order = np.argsort(ids, kind="stable")
    ids, X, rel = ids[order], X[order], rel[order]
    n = len(ids)
    norms = np.linalg.norm(X, axis=1)
    U = X / np.maximum(norms, 1e-8)[:, None]
    k = min(k, n)
    selected = np.empty(k, dtype=np.int64)
    scores = np.empty(k, dtype=np.float64)
    # max similarity of each pool doc to the selected set, running
    max_sim = np.full(n, -np.inf)
    taken = np.zeros(n, dtype=bool)
    for step in range(k):
        if step == 0:
            mmr = lam * rel - (1.0 - lam) * 0.0  # empty-set penalty = 0
        else:
            mmr = lam * rel - (1.0 - lam) * max_sim
        mmr = np.where(taken, -np.inf, mmr)
        pick = int(np.argmax(mmr))  # first max in id order = id ASC tie-break
        selected[step] = pick
        scores[step] = mmr[pick]
        taken[pick] = True
        sims = U @ U[pick]
        np.maximum(max_sim, sims, out=max_sim)
    return order[selected], scores


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lambda_: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "id",
    query_id_col: str = "query_id",
    rel_col: str = "similarity",
) -> DataFrame:
    """Greedy MMR selection of k rows per query from a candidate pool.

    ``candidates`` carries (query_id, id, embedding, relevance) — the
    shape every retrieval tier in the engine already produces once the
    pool vectors are joined back. Output: (query_id, id, relevance,
    mmr_score, rank) with rank 1..k in selection order. mmr_score is
    the greedy objective value AT SELECTION TIME (the step's winning
    margin), the conventional reporting.
    """
    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError(f"lambda_ must be in [0, 1] (got {lambda_})")
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    lam = float(lambda_)
    kk = int(k)

    def select(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        X = np.asarray(pdf[vec_col].to_list(), dtype=np.float64)
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        idx, scores = _mmr_select(ids, X, rel, kk, lam)
        return pd.DataFrame(
            {
                query_id_col: pdf[query_id_col].iloc[0],
                id_col: ids[idx],
                "relevance": rel[idx],
                "mmr_score": scores,
                "rank": np.arange(1, len(idx) + 1, dtype=np.int32),
            }
        )

    pool = candidates.select(query_id_col, id_col, vec_col, rel_col).where(
        F.col(vec_col).isNotNull() & F.col(rel_col).isNotNull()
    )
    schema = (
        f"{query_id_col} long, {id_col} long, relevance double, "
        "mmr_score double, rank int"
    )
    return pool.groupBy(query_id_col).applyInPandas(select, schema=schema)


def mmr_search(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fetch_k: int = 40,
    lambda_: float = 0.5,
    metric: str = "cosine",
    vec_col: str = "embedding",
    id_col: str = "id",
    query_vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Retrieve-then-diversify: exact knn_join fetches ``fetch_k``
    candidates per query (any ANN tier can replace this stage — feed
    its output to :func:`mmr_rerank` directly), the pool's float
    vectors semi-join back, and MMR selects k. fetch_k/k is the
    diversity headroom knob (LangChain convention defaults 20/4; here
    40/10)."""
    if fetch_k < k:
        raise ValueError(f"fetch_k ({fetch_k}) must be >= k ({k})")
    cand = knn_join(
        vectors,
        queries,
        k=int(fetch_k),
        metric=metric,
        vec_col=vec_col,
        id_col=id_col,
        query_vec_col=query_vec_col,
        query_id_col=query_id_col,
    ).select(query_id_col, id_col, "similarity")
    pool = cand.join(
        vectors.select(id_col, vec_col), on=id_col, how="inner"
    )
    return mmr_rerank(
        pool,
        k=k,
        lambda_=lambda_,
        vec_col=vec_col,
        id_col=id_col,
        query_id_col=query_id_col,
        rel_col="similarity",
    )
