"""As-of (temporal) join — a first-class operator Spark lacks natively.

``asof_join(left, right)`` attaches to each left row the most recent
right row with ``right.ts <= left.ts`` within the same key group (the
backward direction of pandas ``merge_asof`` / QuestDB/kdb asof joins).
The reference engine has no join operators at all (SURVEY.md §2.3); this
is part of the relational surface the rebuild exposes.

Spark-first strategy (the scalable one — no per-group pandas, no range
cross join): the classic **union + forward-fill**:

1. tag right rows (carrying their payload) and left rows (payload
   null), union them;
2. one window per key ordered by (ts, is_left) forward-fills the last
   non-null right payload onto every row — ``F.last(ignorenulls=True)``
   over an unbounded-preceding frame;
3. keep the left rows.

Cost: ONE shuffle on the key (the window), state per row O(1). At
100 TB both sides shuffle once on the key — same bound as any equi-join
— and skewed keys are handled by AQE the same way. Ordering ties
(left.ts == right.ts) resolve to "right row at the same timestamp
matches" (<=, like merge_asof's default), implemented by sorting right
rows before left rows at equal ts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] | str = (),
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: latest ``right`` row with ``right.on <=
    left.on`` per ``by`` group.

    Returns all left columns plus each requested right column (renamed
    with ``suffix``) and ``<on><suffix>`` (the matched right timestamp;
    null when no prior right row exists — left-outer semantics).
    """
    by = [by] if isinstance(by, str) else list(by)
    if on not in left.columns or on not in right.columns:
        raise ValueError(f"on={on!r} must exist in both sides")
    for k in by:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"by key {k!r} must exist in both sides")
    right_cols = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c != on and c not in by]
    )

    payload = [F.col(c).alias(f"{c}{suffix}") for c in right_cols] + [
        F.col(on).alias(f"{on}{suffix}")
    ]
    r = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("_side"),  # right sorts before left at equal ts => <=
        F.struct(*payload).alias("_payload"),
    )
    l = left.select(
        *left.columns,
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out = filled.where(F.col("_side") == 1).drop("_side", "_payload")
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("_match")[f"{c}{suffix}"])
    out = out.withColumn(f"{on}{suffix}", F.col("_match")[f"{on}{suffix}"])
    return out.drop("_match")
