"""Deterministic sampling operators for training-data mixing.

A training run rarely consumes a corpus uniformly: the mix is specified
as per-stratum quotas or weights ("40% web, 30% code, ...").  The
reference has no sampling surface at all; these operators add the two
standard forms, built so the SAME rows are selected on every run and on
every engine:

- :func:`stratified_sample_exact` — exactly ``n`` rows per stratum
  (or all rows of a smaller stratum), chosen by a deterministic
  hash order, not by RNG state;
- :func:`weighted_sample` — keep each row iff
  ``hash(id) < weight * 2^63``-style threshold on a uniform-ish
  deterministic key, giving a fixed expected fraction per stratum
  without a shuffle.

Determinism design: ordering/thresholding keys derive from ``md5`` of
the row id (a public, engine-portable hash — Spark and DuckDB produce
identical digests), NOT from ``rand(seed)`` whose stream depends on
partitioning. That makes results reproducible across cluster sizes,
retries, AND expressible as a SQL oracle.

Scale: the exact variant is one shuffle (hash-partition by stratum) +
per-partition top-n via ``WindowGroupLimit`` — the map-side partial
keeps only n rows per (partition, stratum) before the exchange. The
weighted variant is a pure filter: no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["stratified_sample_exact", "weighted_sample", "sample_key", "plan_mixture"]


def sample_key(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic, engine-portable pseudo-uniform key in [0, 1):
    the first 8 hex digits of ``md5(salt || id)`` scaled to [0, 1).
    32 bits of resolution is plenty for sampling decisions; md5 gives
    the same digits in Spark, DuckDB, Python, etc."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    hx = F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8)
    return F.conv(hx, 16, 10).cast("double") / F.lit(float(1 << 32))


def stratified_sample_exact(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows from each stratum (all rows when
    the stratum is smaller), selected as the lowest
    :func:`sample_key` values — a deterministic uniform draw that every
    engine reproduces. Adds no columns; row set is stable under
    repartitioning and retries.

    Plan: ``row_number`` over (stratum, key) with a rank filter —
    Spark's WindowGroupLimit pushes a per-partition top-n ahead of the
    single hash-partition exchange, so the shuffle carries at most
    ``n_per_stratum`` rows per (input partition, stratum).
    """
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1 (got {n_per_stratum})")
    key = sample_key(id_col, salt)
    w = Window.partitionBy(stratum_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame,
    weights: Mapping[str, float] | float,
    stratum_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep each row with deterministic probability ``weights`` — a
    single float for a uniform sample, or a per-stratum mapping
    (missing strata keep weight 0.0). A pure filter on
    ``sample_key(id) < weight``: NO shuffle, no RNG state, identical
    row set at any parallelism; composable with any downstream plan.
    """
    key = sample_key(id_col, salt)
    if isinstance(weights, Mapping):
        if stratum_col is None:
            raise ValueError("stratum_col required for per-stratum weights")
        for s, wt in weights.items():
            if not 0.0 <= float(wt) <= 1.0:
                raise ValueError(f"weight for {s!r} must be in [0, 1] (got {wt})")
        expr = F.lit(0.0)
        for s, wt in weights.items():
            expr = F.when(F.col(stratum_col) == s, F.lit(float(wt))).otherwise(expr)
        return df.where(key < expr)
    wt = float(weights)
    if not 0.0 <= wt <= 1.0:
        raise ValueError(f"weight must be in [0, 1] (got {wt})")
    return df.where(key < F.lit(wt))


def plan_mixture(
    df: DataFrame,
    targets: Mapping[str, float],
    stratum_col: str = "source",
    weight_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> tuple[DataFrame, DataFrame]:
    """Token-budget data mixing: given per-stratum TARGET masses
    (tokens, rows — whatever ``weight_col`` measures; rows when None),
    derive the per-stratum keep-probability ``min(1, target/actual)``
    and apply it as a deterministic :func:`weighted_sample`-style
    filter. The standard pretraining-mix step ("this run wants 40B web
    tokens, 10B code tokens") expressed as a plan over the corpus.

    Returns ``(plan, sampled)``:

    - ``plan`` — one row per stratum present in ``df``:
      ``(stratum, available, target, keep_prob)``; strata missing from
      ``targets`` get target 0 (dropped), targets above availability
      clamp to keep everything (a plan can't mint data — the plan row
      makes the shortfall visible instead of hiding it);
    - ``sampled`` — the filtered corpus. Expected kept mass per stratum
      is ``keep_prob * available``.

    Scale: the availability aggregate is ONE map-side-combinable
    groupBy; the plan is stratum-sized (broadcast); the sample is a
    pure filter keyed on md5 of the row id — no shuffle of the corpus,
    same rows on every engine/cluster/retry.
    """
    for s, t in targets.items():
        if float(t) < 0:
            raise ValueError(f"target for {s!r} must be >= 0 (got {t})")
    mass = F.lit(1.0) if weight_col is None else F.col(weight_col).cast("double")
    avail = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.sum(mass).alias("available")
    )
    tgt = F.lit(0.0)
    for s, t in targets.items():
        tgt = F.when(F.col("stratum") == s, F.lit(float(t))).otherwise(tgt)
    plan = avail.select(
        "stratum",
        "available",
        tgt.alias("target"),
        F.least(
            F.lit(1.0),
            F.when(F.col("available") > 0, tgt / F.col("available")).otherwise(
                F.lit(0.0)
            ),
        ).alias("keep_prob"),
    )
    key = sample_key(id_col, salt)
    joined = df.join(
        F.broadcast(plan.select(F.col("stratum").alias(stratum_col), "keep_prob")),
        on=stratum_col,
        how="left",
    )
    sampled = joined.where(key < F.coalesce(F.col("keep_prob"), F.lit(0.0))).drop(
        "keep_prob"
    )
    return plan, sampled
