"""Per-group vector centroids — the vector AGGREGATION primitive.

Every other vector operator in the engine searches (knn/maxsim) or
compresses (pq/bq); a 100 TB curation pipeline also needs per-group MEAN
vectors: cluster summaries, drift monitors, cheap class prototypes, the
k-means update step. The reference engine has no aggregation over its
vector payload at all (service/optimized_vector_store.py exposes only
per-store scalar stats), so this is beyond-reference surface.

Spark-first shape: ``posexplode -> groupBy(group, pos) avg``. The
``(group, pos)`` partial aggregate is map-side combinable, so the ONE
shuffle carries ``groups x dim`` narrow rows (hundreds), never the
exploded element stream — the plan that stays linear at 1000 executors
(measured ~linear at dim 768 x 10k labels x 1M vectors, SCALE.md r12).

Two output shapes:

- :func:`label_centroids_long` — per-dimension rows ``(label, pos, m,
  n_vectors, centroid_norm)``, all scalar columns. This is the shape
  downstream Spark/SQL consumers join against and the shape the
  correctness harness can canonicalize (VERDICT r12: driver value
  hashing requires scalar cells).
- :func:`label_centroids` — one row per group with the reassembled
  ``centroid array<double>`` (``sort_array(collect_list(struct))`` over
  the few per-dimension rows), for callers that feed the centroid back
  into vector ops.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _per_dim(df: DataFrame, vec_col: str, label_col: str) -> DataFrame:
    return (
        df.select(label_col, F.posexplode(vec_col).alias("pos", "val"))
        .groupBy(label_col, "pos")
        .agg(F.avg("val").alias("m"), F.count(F.lit(1)).alias("n"))
    )


def label_centroids_long(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    decimals: int = 6,
) -> DataFrame:
    """Per-dimension centroid rows ``(label, pos, m, n_vectors,
    centroid_norm)`` — scalar columns only. ``centroid_norm`` is the
    L2 norm of the group's UNROUNDED mean vector (window sum over the
    group's dim rows — tiny partitions, no skew), repeated per row so a
    single scan answers both "which dimension drifted" and "how long is
    the prototype"."""
    w = Window.partitionBy(label_col)
    per_dim = _per_dim(df, vec_col, label_col)
    return per_dim.select(
        label_col,
        F.col("pos").cast("int").alias("pos"),
        F.round("m", decimals).alias("m"),
        F.col("n").cast("long").alias("n_vectors"),
        F.round(
            F.sqrt(F.sum(F.col("m") * F.col("m")).over(w)), decimals
        ).alias("centroid_norm"),
    ).orderBy(label_col, "pos")


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    decimals: int = 6,
) -> DataFrame:
    """One row per group: ``(label, n_vectors, centroid array<double>,
    centroid_norm)``. The centroid is reassembled from the per-dimension
    aggregate with ``sort_array(collect_list(struct(pos, m)))`` — the
    collect_list runs over ``dim`` rows per group, never over the input
    vectors."""
    per_dim = _per_dim(df, vec_col, label_col)
    return (
        per_dim.groupBy(label_col)
        .agg(
            F.first("n").alias("n_vectors"),
            F.sort_array(F.collect_list(F.struct("pos", "m"))).alias("pairs"),
        )
        .select(
            label_col,
            F.col("n_vectors").cast("long").alias("n_vectors"),
            F.transform("pairs", lambda p: F.round(p["m"], decimals)).alias(
                "centroid"
            ),
            F.round(
                F.sqrt(
                    F.aggregate(
                        "pairs",
                        F.lit(0.0),
                        lambda acc, p: acc + p["m"] * p["m"],
                    )
                ),
                decimals,
            ).alias("centroid_norm"),
        )
        .orderBy(label_col)
    )
