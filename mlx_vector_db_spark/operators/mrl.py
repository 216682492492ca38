"""Matryoshka (prefix-dimension) adaptive retrieval.

Matryoshka Representation Learning (Kusupati et al., NeurIPS 2022 —
public method) trains embeddings so every PREFIX of the vector is
itself a valid lower-dimensional embedding: the first 64 of 768 dims
carry most of the ranking signal. Retrieval then runs as a funnel —
a cheap candidate scan over the first ``d_prefix`` dimensions followed
by an exact re-rank over the full vector ("adaptive retrieval" in the
paper; shipped by OpenAI/Nomic/Jina as the `dimensions` knob). At
100 TB the candidate pass reads ``d_prefix/D`` of the float bytes
(e.g. 1/12th at 64/768) with plain dense scoring — no codebooks, no
training, and unlike PQ/BQ the candidate scores are TRUE similarities
of a valid sub-embedding, so the over-fetch needed is small.

Spark-first: the whole operator is a composition of existing engine
pieces — ``F.slice`` projects the prefix inside the scan (Catalyst
prunes and pushes; no UDF), the candidate stage IS :func:`knn_join`
(inheriting its auto-dispatched expression/blocked strategies, NULL
exclusion, and TakeOrderedAndProject plan), and the re-rank is the
same semi-join + exact knn_join second pass as pq/bq_search_batch.
Nothing new runs per-row in Python.

Column-store note: ``F.slice`` prunes WITHIN a row after the list
column is read, so the candidate pass saves compute (score FLOPs drop
by D/d_prefix) but not parquet IO. A deployment that wants the IO cut
too materializes the prefix once as its own column/table
(``prefix_column`` below) — then the candidate scan's ReadSchema is
the short column only, the strongest form of the idea.

Reference parity: the reference has no MRL path (fixed-dim stores,
config.dimension); beyond-reference addition on its over-fetch/re-rank
policy (service/optimized_vector_store.py:121-135).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.knn import knn_join

__all__ = ["mrl_search_batch", "prefix_column"]


def prefix_column(
    df: DataFrame,
    d_prefix: int,
    vec_col: str = "embedding",
    out_col: str = "embedding_prefix",
) -> DataFrame:
    """Materialize the first ``d_prefix`` dims as their own column.

    Write the result once; candidate scans over ``out_col`` then read
    d_prefix/D of the float bytes (parquet column pruning does the
    rest). Pure projection — stateless, streaming-safe."""
    if d_prefix < 1:
        raise ValueError(f"d_prefix must be >= 1 (got {d_prefix})")
    return df.withColumn(out_col, F.slice(F.col(vec_col), 1, int(d_prefix)))


def mrl_search_batch(
    vectors: DataFrame,
    queries: DataFrame,
    d_prefix: int,
    k: int = 10,
    metric: str = "cosine",
    overfetch: int = 4,
    vec_col: str = "embedding",
    id_col: str = "id",
    query_vec_col: str = "embedding",
    query_id_col: str = "query_id",
    prefix_col: str | None = None,
) -> DataFrame:
    """Two-pass batch k-NN through the Matryoshka funnel.

    Pass 1: exact k-NN over the first ``d_prefix`` dimensions of both
    sides (``F.slice`` in the scan projection — or a pre-materialized
    ``prefix_col`` for the IO cut), taking ``k * overfetch`` candidates
    per query through knn_join's auto-dispatched strategies. Pass 2:
    exact re-rank over the FULL vectors for the candidate union
    (semi-join on id), cutting to k with exact scores/ordering.

    Recall depends on how front-loaded the embedding's signal is:
    MRL-trained models are near-lossless at D/8 prefixes (the paper's
    operating point); on embeddings with uniform per-dim information a
    d_prefix/D fraction of the variance decides the candidate ranking
    and the over-fetch must absorb the rest (measured in
    mrl_recall_gate on a decay-weighted fixture vs a uniform control).
    """
    if d_prefix < 1:
        raise ValueError(f"d_prefix must be >= 1 (got {d_prefix})")
    if overfetch < 1:
        raise ValueError(f"overfetch must be >= 1 (got {overfetch})")
    if prefix_col is not None:
        pv = vectors.select(id_col, F.col(prefix_col).alias(vec_col))
    else:
        pv = vectors.select(
            id_col, F.slice(F.col(vec_col), 1, int(d_prefix)).alias(vec_col)
        )
    pq = queries.select(
        query_id_col,
        F.slice(F.col(query_vec_col), 1, int(d_prefix)).alias(query_vec_col),
    )
    cand = knn_join(
        pv,
        pq,
        k=int(k) * int(overfetch),
        metric=metric,
        vec_col=vec_col,
        id_col=id_col,
        query_vec_col=query_vec_col,
        query_id_col=query_id_col,
    )
    # pass-2 knn_join's delegation gate probes the vectors side eagerly;
    # the lazy checkpoint makes the prefix-kNN candidate stage run once
    # (at the probe, if it fires) and be reused by the re-rank AND the
    # semi-join instead of re-executing pass 1 (ADVICE r10)
    cand_ids = cand.select(id_col).distinct().localCheckpoint(eager=False)
    subset = vectors.join(cand_ids, on=id_col, how="left_semi")
    return knn_join(
        subset,
        queries,
        k=k,
        metric=metric,
        vec_col=vec_col,
        id_col=id_col,
        query_vec_col=query_vec_col,
        query_id_col=query_id_col,
        # bounded candidate subset: skip the expression path's
        # split-collapse exchange (see pq_search_batch pass 2)
        rebalance_vectors=False,
    )
