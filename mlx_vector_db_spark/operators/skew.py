"""Skew-safe shuffles: salted joins and two-phase aggregation.

At 100 TB a single hot key (one viral document id, one null-ish default
user) turns a hash-shuffle join or aggregation into a one-task
straggler. Spark's AQE skew-join handles the sort-merge case at runtime
(`spark.sql.adaptive.skewJoin.enabled`, on in this engine's session),
but two shapes still need the explicit form:

- joins AQE can't split (the skewed side feeding a downstream stateful
  op, or a broadcast-ineligible build side), and
- aggregations, which AQE never splits — a hot group key lands on one
  reducer no matter what.

``salted_join`` scatters each left row into one of ``salt`` sub-keys
and replicates the (small-ish) right side ``salt`` ways, so a hot key's
rows spread over ``salt`` reducers; each left row still meets every
matching right row exactly once. ``salted_aggregate`` is classic
two-phase aggregation: partial per (key, salt), final per key — valid
for the algebraic aggregates (sum/count/min/max), which re-combine
losslessly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_aggregate"]

#: per-aggregate (partial, final) combine rules — algebraic aggregates
#: only: these recombine losslessly across salt buckets
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _salt_col(salt: int) -> Column:
    """A per-row salt in [0, salt): derived from a per-row unique id so
    rows of the SAME join/group key scatter across buckets. The id is
    partition-order dependent (monotonically_increasing_id), which is
    fine: any scatter is correct, results never depend on which bucket
    a row landed in."""
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast(
        "int"
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys scattered ``salt`` ways.

    The right side is replicated ``salt`` times (explode over the salt
    range) — size it accordingly: right should be the smaller side, but
    too big to broadcast (else just ``broadcast()`` it and skew is moot).
    Supports ``inner`` and ``left`` joins (the semantics where one left
    row meeting each right match exactly once is well-defined).

    Equivalent rows to ``left.join(right, on, how)`` — asserted in
    tests on skewed data — with the shuffle key ``(key..., _salt)``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 2:
        raise ValueError(f"salt must be >= 2, got {salt}")
    keys = [on] if isinstance(on, str) else list(on)
    overlap = set(left.columns) & set(right.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"ambiguous non-key columns on both sides: {sorted(overlap)}"
        )
    if "_salt" in left.columns or "_salt" in right.columns:
        raise ValueError(
            "'_salt' is reserved by salted_join; rename the input column"
        )
    l = left.withColumn("_salt", _salt_col(salt))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return l.join(r, on=keys + ["_salt"], how=how).drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: str | list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output column name -> (function, input column) with
    function in {sum, count, min, max}. The partial aggregate groups by
    (keys..., salt) — a hot key's rows spread over ``salt`` reducers —
    and the final pass recombines the (tiny) partials per key.

    (Spark's own hash aggregation already map-side combines, which
    handles *moderate* skew; this is for the pathological key whose
    combined partials still overwhelm one reducer, and for plans where
    the partial agg is disabled — e.g. high-cardinality intermediate
    maps.) Results equal the direct groupBy — asserted in tests.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if "_salt" in df.columns:
        raise ValueError(
            "'_salt' is reserved by salted_aggregate; rename the input column"
        )
    partials, finals = [], []
    for out_name, (fn, col) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(
                f"{out_name}: {fn!r} is not algebraic; supported: "
                f"{sorted(_ALGEBRAIC)} (avg = sum/count at the call site)"
            )
        partial_fn, final_fn = _ALGEBRAIC[fn]
        pname = f"_p_{out_name}"
        partials.append(partial_fn(col).alias(pname))
        finals.append(final_fn(pname).alias(out_name))
    salted = df.withColumn("_salt", _salt_col(salt))
    return salted.groupBy(*keys, "_salt").agg(*partials).groupBy(*keys).agg(*finals)
