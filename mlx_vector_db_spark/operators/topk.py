"""Per-group top-k — the engine's one "sort" (reference A1,
service/optimized_vector_store.py:176-183: argsort + slice per query).

Spark-first: a rank window with an eager ``rank <= k`` filter. Catalyst's
WindowGroupLimit rule (spark.sql.optimizer.windowGroupLimitThreshold,
default 1000) pushes the limit below the window sort, so each shuffle
partition keeps only k rows per group in a bounded heap instead of fully
sorting — this is what makes per-query top-k survive a 100 TB scan: the
post-shuffle volume is O(num_groups * k), not O(N).

For the single-query case, prefer ``ORDER BY ... LIMIT k`` (Catalyst
compiles it to TakeOrderedAndProject — a per-partition heap plus a
driver-side merge, no shuffle at all).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top ``k`` rows of each group, adding a 1-based ``rank_col``.

    ``order_by`` must produce a deterministic total order — callers
    should append an id tie-breaker (FIXTURES.md: ``score DESC, id ASC``;
    the reference's argsort tie order is unspecified, so we document and
    test this canonical one).

    ``row_number`` (not ``rank``) matches the reference: ties consume
    ranks, exactly k rows per group come back.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= F.lit(k)
    )


def bounded_global_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    rank_col: str = "rank",
) -> DataFrame:
    """1-based global rank for a result ALREADY bounded to a handful of
    rows (post-``LIMIT k`` survivors, fused top-k arms, gate scalars).

    A global rank needs a total order, which in Spark means one window
    group; on a bounded input that is the right plan, not a smell — the
    single partition the window moves data into holds only the bounded
    rows. (Catalyst folds constant partition keys away, so the
    ``WindowExec: No Partition Defined`` warning can't be avoided at the
    plan level; ``session._silence_bounded_window_warn`` scopes it out.)

    Do NOT call this on an unbounded DataFrame — ``ORDER BY + LIMIT``
    (TakeOrderedAndProject) or :func:`top_k_per_group` first.
    """
    w = Window.orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w))
