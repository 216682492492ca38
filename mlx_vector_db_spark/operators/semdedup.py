"""SemDeDup: semantic deduplication via embedding clusters.

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (2023): documents whose EMBEDDINGS nearly
coincide are semantic duplicates even when their text differs
(re-encodings, translations, paraphrased boilerplate) — exactly the
duplicates that MinHash/SimHash text resemblance cannot see. The
algorithm: k-means-cluster the embedding space, compare pairs only
WITHIN a cluster (near-dups land in the same cell; cross-cluster pairs
are by construction far), and keep one representative per duplicate
group.

Composition over this repo's existing pieces — each already
oracle/recall-gated on its own:

- clustering: :func:`~mlx_vector_db_spark.operators.clustering.
  kmeans_fit` (bounded-sample Lloyd's, assignment as a pure JVM
  expression);
- candidate pairs: :func:`~mlx_vector_db_spark.operators.dedup.
  embedding_neardup_pairs` with the cluster id as the blocking key
  (the join never crosses a cluster boundary);
- duplicate groups: :func:`~mlx_vector_db_spark.operators.components.
  connected_components` (transitive closure, min-label propagation).

Keeper policy: ``"min_id"`` (default) keeps the smallest id per group —
fully deterministic and SQL-oracle-friendly. ``"far_centroid"`` keeps
the member FARTHEST from its cluster centroid (the paper's choice: it
biases the surviving set toward the cluster's edge, away from the
over-represented mode), ties broken by id.

Scale (100 TB): the paper's own scaling rule — k grows with the corpus
so the expected cluster size n/k stays bounded — is what bounds the
within-cluster self-join. A degenerate hot cluster (mass duplication
collapses embeddings onto one point) still explodes B^2, so
``max_cluster_size`` caps participation: oversized clusters are
EXCLUDED from pair search (their rows all survive, recall degrades
gracefully, a warning names the fix: raise k). ``"auto"`` derives the
cap from the cluster-size distribution via the shared fan-out-budget
knee (:func:`~mlx_vector_db_spark.operators.dedup.fanout_autocap`).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.clustering import KMeansModel, kmeans_fit
from mlx_vector_db_spark.operators.components import connected_components
from mlx_vector_db_spark.operators.dedup import embedding_neardup_pairs, fanout_autocap

__all__ = ["semdedup_pairs", "semdedup"]


def _capped_assignment(
    assigned: DataFrame, max_cluster_size, id_col: str
) -> DataFrame:
    """Drop members of clusters larger than the cap from the PAIR
    SEARCH (they still survive dedup — exclusion only skips their
    comparisons)."""
    if max_cluster_size is None:
        return assigned
    sizes = assigned.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("_df"))
    if isinstance(max_cluster_size, str):
        if max_cluster_size != "auto":
            raise ValueError(
                f"max_cluster_size must be an int, 'auto', or None "
                f"(got {max_cluster_size!r})"
            )
        sizes = sizes.localCheckpoint(eager=False)
        cap = fanout_autocap(sizes, assigned.count())
    else:
        cap = int(max_cluster_size)
        if cap < 2:
            raise ValueError(f"max_cluster_size must be >= 2 (got {cap})")
    kept = sizes.where(F.col("_df") <= F.lit(cap)).select("cluster_id")
    dropped = sizes.where(F.col("_df") > F.lit(cap)).count()
    if dropped:
        warnings.warn(
            f"semdedup: {dropped} cluster(s) exceed max_cluster_size={cap} "
            f"and are excluded from pair search (their rows all survive). "
            f"Raise k so expected cluster size n/k stays under the cap.",
            stacklevel=3,
        )
    return assigned.join(kept, on="cluster_id", how="left_semi")


def _pairs_arrow(
    assigned: DataFrame, threshold: float, vec_col: str, id_col: str
) -> DataFrame:
    """Within-cluster pairs as one BLAS gram matrix per cluster
    (``applyInPandas`` over the cluster id — the SemDeDup paper's
    actual computation): at s members/cluster the relational form
    evaluates s^2/2 interpreted zip_with cosines per cluster (~15 us
    each — measured 180 s for 10M candidates at sf10), where the
    normalized X @ X.T is one vectorized call. Emits only qualifying
    pairs. Matches the expression path's eps-floored cosine exactly."""
    import numpy as np
    import pandas as pd

    from mlx_vector_db_spark.functions.vector import NORM_EPS

    id_type = assigned.schema[id_col].dataType
    out_schema = f"id_a {id_type.simpleString()}, id_b {id_type.simpleString()}, cosine double"
    thr = float(threshold)

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        order = pdf[id_col].to_numpy().argsort(kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        X = np.vstack(pdf[vec_col].to_numpy()[order]).astype(np.float64, copy=False)
        norms = np.maximum(np.sqrt((X**2).sum(axis=1)), NORM_EPS)
        S = (X @ X.T) / np.outer(norms, norms)
        iu, ju = np.triu_indices(n, k=1)
        keep = S[iu, ju] >= thr
        return pd.DataFrame(
            {"id_a": ids[iu[keep]], "id_b": ids[ju[keep]], "cosine": S[iu, ju][keep]}
        )

    return assigned.groupBy("cluster_id").applyInPandas(score, out_schema)


def semdedup_pairs(
    df: DataFrame,
    k: int = 1024,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    model: KMeansModel | None = None,
    max_cluster_size: int | str | None = "auto",
    max_train_rows: int = 262_144,
    pair_method: str = "arrow",
) -> DataFrame:
    """Within-cluster semantic near-duplicate pairs:
    ``(id_a, id_b, cosine >= threshold)``, both ids in the same k-means
    cell. Pass a fitted ``model`` to reuse one clustering across calls
    (and to make the blocking reproducible for gates).

    ``pair_method="arrow"`` (default) scores each cluster as one BLAS
    gram matrix; ``"expr"`` is the pure-relational form
    (:func:`~mlx_vector_db_spark.operators.dedup.
    embedding_neardup_pairs`) — same pairs, kept as the
    plan-transparent audit tier."""
    if not 0.0 < float(threshold) <= 1.0:
        raise ValueError(f"threshold must be in (0, 1] (got {threshold})")
    if pair_method not in ("arrow", "expr"):
        raise ValueError(f"pair_method must be arrow|expr (got {pair_method!r})")
    mdl = model if model is not None else kmeans_fit(
        df, k, vec_col=vec_col, seed=seed, max_train_rows=max_train_rows
    )
    # fence the assignment: the size aggregate, the semi-join, and BOTH
    # sides of the pair self-join consume it — unfenced, the per-row
    # argmin would re-run once per consumer
    assigned = mdl.assign(df, dist_col=None).localCheckpoint(eager=False)
    assigned = _capped_assignment(assigned, max_cluster_size, id_col)
    if pair_method == "arrow":
        return _pairs_arrow(assigned, threshold, vec_col, id_col)
    return embedding_neardup_pairs(
        assigned,
        vec_col=vec_col,
        id_col=id_col,
        threshold=threshold,
        bucket_col="cluster_id",
    )


def semdedup(
    df: DataFrame,
    k: int = 1024,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    keep: str = "min_id",
    model: KMeansModel | None = None,
    max_cluster_size: int | str | None = "auto",
    max_train_rows: int = 262_144,
    pair_method: str = "arrow",
) -> DataFrame:
    """Corpus filtered to one survivor per semantic-duplicate group
    (see module docstring). Returns ``df``'s rows minus the doomed
    members; column set unchanged.

    The doomed set stays a DataFrame end to end (anti-join, never a
    collected id list) — the same distributed-delete discipline as
    ``VectorStore.dedup_vectors``.
    """
    if keep not in ("min_id", "far_centroid"):
        raise ValueError(f"keep must be 'min_id' or 'far_centroid' (got {keep!r})")
    mdl = model if model is not None else kmeans_fit(
        df, k, vec_col=vec_col, seed=seed, max_train_rows=max_train_rows
    )
    pairs = semdedup_pairs(
        df,
        k=k,
        threshold=threshold,
        vec_col=vec_col,
        id_col=id_col,
        seed=seed,
        model=mdl,
        max_cluster_size=max_cluster_size,
        pair_method=pair_method,
    )
    comp = connected_components(pairs)
    if keep == "min_id":
        doomed = comp.where(F.col("node") != F.col("component")).select(
            F.col("node").alias(id_col)
        )
    else:
        dists = mdl.assign(df, dist_col="_cdist").select(
            F.col(id_col).alias("node"), "_cdist"
        )
        members = comp.join(dists, on="node")
        w = Window.partitionBy("component").orderBy(
            F.col("_cdist").desc(), F.col("node")
        )
        doomed = (
            members.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") > 1)
            .select(F.col("node").alias(id_col))
        )
    return df.join(doomed, on=id_col, how="left_anti")
