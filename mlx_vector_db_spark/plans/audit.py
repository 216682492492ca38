"""Physical-plan auditing helpers.

The scale story of this engine is carried by plan shapes, not code
paths: filters must reach the parquet scan, per-query top-k must be a
WindowGroupLimit (map-side partial), small sides must broadcast, scans
must be column-pruned. These helpers make those properties assertable in
tests so a refactor that silently degrades a plan fails CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame) -> str:
    """The executed physical plan as a string (AQE final plan where
    applicable)."""
    return df._jdf.queryExecution().executedPlan().toString()


def plan_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    """Which of the given substrings appear in the physical plan."""
    plan = explain_str(df)
    return {n: (n in plan) for n in needles}
