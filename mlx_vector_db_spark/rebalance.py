"""Parallelism guard for CPU-bound per-row operators.

Compute-heavy projections (shingling, hashing, chunking) inherit the
scan's partitioning. A table packed into fewer files than the session
has cores — a single-file local table, or an over-compacted dimension
at scale — serializes that work onto a handful of tasks regardless of
cluster size. The guard shuffles the *narrow* projection (a few MB of
id + text) out to the default parallelism only when the input is
under-partitioned; any real wide scan (a 100 TB table is thousands of
splits) passes through untouched, shuffle-free.

Known hazard (found r4): the guard protects PROJECTIONS, but predicate
pushdown can hop over the repartition — a ``where()`` on expensive
computed columns gets its aliases inlined into a Filter BELOW this
exchange, serializing exactly the compute the rebalance spreads onto
the raw scan's few input partitions. When filtering on heavy signals,
wrap the signal projection in :func:`pushdown_barrier` first (see
``q_curation_pipeline``) — pushdown cannot cross an RDD scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

__all__ = ["rebalance_for_compute", "pushdown_barrier"]


def pushdown_barrier(df: DataFrame) -> DataFrame:
    """Stop predicate pushdown from hopping below this point.

    Use when a downstream ``where()`` references EXPENSIVE computed
    columns over a rebalanced frame: Catalyst inlines deterministic
    aliases into the pushed filter, which then executes below the
    rebalance exchange — on the raw scan's (few) input partitions,
    serializing exactly the compute :func:`rebalance_for_compute`
    spreads. A lazy ``localCheckpoint`` truncates the lineage to an RDD
    scan, which no rule pushes through; it also caches the frame, which
    is usually what a multiply-consumed signal table wants anyway.
    """
    return df.localCheckpoint(eager=False)


def rebalance_for_compute(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Project ``df`` down to ``cols`` (all columns when omitted) and,
    if the plan has fewer partitions than ``defaultParallelism``, round-
    robin repartition it to that width so the downstream per-row compute
    uses every core. Inspecting the partition count plans the query but
    launches no job."""
    narrow = df.select(*cols) if cols else df
    sc = narrow.sparkSession.sparkContext
    target = sc.defaultParallelism
    if narrow.rdd.getNumPartitions() < target:
        narrow = narrow.repartition(target)
    return narrow
