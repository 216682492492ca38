"""Data-quality constraint auditing — the Deequ/Great-Expectations
shape, Spark-first: declare constraints, get one violations report in
as few passes as the constraint mix allows.

A 100 TB ingest without a constraint gate ships silent nulls, dup keys
and orphaned foreign keys into every downstream join; the reference
engine validates only vector shape/dtype at its API boundary
(api/routes/vectors.py request models) — table-level invariants have
no surface there at all. This module adds the standard audit:

- ``completeness`` — NULL fraction per column;
- ``uniqueness`` — duplicate-value count per key (single or composite);
- ``in_range`` / ``accepted_values`` / ``matches`` — row predicates;
- ``fk`` — orphaned-reference count against a parent table.

Report schema (one row per constraint)::

    constraint string, column string, violations long, checked long,
    passed boolean

Scale shape: ALL row-predicate constraints (completeness, range,
accepted values, regex) compile into ONE aggregation pass over the
table — a single job of conditional sums, map-side combinable, no
shuffle wider than the 1-row result. Each ``uniqueness`` adds one
groupBy on its key (count>1 groups aggregate to one row before
leaving the exchange); each ``fk`` adds one left-anti join against the
parent's distinct keys (AQE broadcasts small parents). Nothing is ever
collected except the per-constraint counter rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Check", "dq_audit"]


@dataclass
class Check:
    """Declarative constraint set for :func:`dq_audit`."""

    completeness: list[str] = field(default_factory=list)
    uniqueness: list[str | tuple[str, ...]] = field(default_factory=list)
    in_range: dict[str, tuple[float | None, float | None]] = field(
        default_factory=dict
    )
    accepted_values: dict[str, list] = field(default_factory=dict)
    matches: dict[str, str] = field(default_factory=dict)
    fk: dict[str, tuple[DataFrame, str]] = field(default_factory=dict)

    def is_empty(self) -> bool:
        return not (
            self.completeness
            or self.uniqueness
            or self.in_range
            or self.accepted_values
            or self.matches
            or self.fk
        )


def _pred_violation(name: str, col: str, bad: Column) -> tuple[str, str, Column]:
    """(constraint, column, conditional-sum expression) — NULLs never
    count as predicate violations except for completeness itself (a
    NULL price is a completeness finding, not a range finding). The
    coalesce keeps an empty table's report at violations=0/passed=true
    (checked=0) instead of NULL — sum over zero rows is NULL in SQL."""
    return name, col, F.coalesce(
        F.sum(F.when(bad, 1).otherwise(0)), F.lit(0)
    ).cast("long")


def dq_audit(df: DataFrame, check: Check) -> DataFrame:
    """Run every constraint in ``check`` against ``df`` and return the
    violations report (see module docstring for schema and the
    pass-count design)."""
    if check.is_empty():
        raise ValueError("check declares no constraints")

    preds: list[tuple[str, str, Column]] = []
    for c in check.completeness:
        preds.append(_pred_violation("completeness", c, F.col(c).isNull()))
    for c, (lo, hi) in check.in_range.items():
        if lo is None and hi is None:
            raise ValueError(f"in_range for {c!r} needs at least one bound")
        bad = F.lit(False)
        if lo is not None:
            bad = bad | (F.col(c) < F.lit(lo))
        if hi is not None:
            bad = bad | (F.col(c) > F.lit(hi))
        preds.append(_pred_violation("in_range", c, F.col(c).isNotNull() & bad))
    for c, vals in check.accepted_values.items():
        if not vals:
            raise ValueError(f"accepted_values for {c!r} is empty")
        preds.append(
            _pred_violation(
                "accepted_values", c, F.col(c).isNotNull() & ~F.col(c).isin(vals)
            )
        )
    for c, pat in check.matches.items():
        preds.append(
            _pred_violation(
                "matches", c, F.col(c).isNotNull() & ~F.col(c).rlike(pat)
            )
        )

    reports: list[DataFrame] = []
    wide = None
    if preds:
        aggs = [F.count(F.lit(1)).cast("long").alias("_n")] + [
            expr.alias(f"_v{i}") for i, (_, _, expr) in enumerate(preds)
        ]
        # fence the 1-row wide aggregate: the per-constraint report rows
        # each select from it, and unfenced each union branch would
        # re-run the full table scan (the "ONE pass" claim must hold in
        # the PHYSICAL plan, not just the logical one)
        wide = df.agg(*aggs).localCheckpoint(eager=False)
        rows = None

        for i, (name, col, _) in enumerate(preds):
            one = wide.select(
                F.lit(name).alias("constraint"),
                F.lit(col).alias("column"),
                F.col(f"_v{i}").alias("violations"),
                F.col("_n").alias("checked"),
            )
            rows = one if rows is None else rows.unionByName(one)
        reports.append(rows)

    # ONE total-row count shared by every uniqueness/fk report: when the
    # row-predicate pass ran, its fenced ``_n`` IS that count — re-deriving
    # it per constraint re-plans (and without exchange reuse, re-runs) a
    # full count scan per report row for a value the plan already holds
    total = (
        wide.select(F.col("_n").alias("checked"))
        if wide is not None
        else df.agg(F.count(F.lit(1)).cast("long").alias("checked"))
        .localCheckpoint(eager=False)
        if (check.uniqueness or check.fk)
        else None
    )

    for key in check.uniqueness:
        cols = [key] if isinstance(key, str) else list(key)
        dup = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("_c"))
            .where(F.col("_c") > 1)
            # a group of c duplicates is c violating rows
            .agg(
                F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("violations")
            )
        )
        reports.append(
            dup.crossJoin(F.broadcast(total)).select(
                F.lit("uniqueness").alias("constraint"),
                F.lit(",".join(cols)).alias("column"),
                "violations",
                "checked",
            )
        )

    for child_col, (parent, parent_col) in check.fk.items():
        keys = parent.select(F.col(parent_col).alias(child_col)).distinct()
        orphans = (
            df.where(F.col(child_col).isNotNull())
            .join(keys, on=child_col, how="left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        )
        reports.append(
            orphans.crossJoin(F.broadcast(total)).select(
                F.lit("fk").alias("constraint"),
                F.lit(child_col).alias("column"),
                "violations",
                "checked",
            )
        )

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("violations") == 0)
