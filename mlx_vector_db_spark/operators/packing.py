"""Token-budget sequence packing — batching documents for training.

A training-data pipeline staple the reference never needed: group
documents into bins whose total token count stays under a budget
(sequence packing for LLM pretraining batches). Exact global bin
packing is NP-hard and needs a serial pass; the distributed-useful
contract is *local* packing: greedy first-fit inside each partition
(optionally per group key), which parallelizes embarrassingly and wastes
at most one partial bin per partition — negligible at corpus scale and
standard practice in packing pipelines.

Output adds ``bin_id`` (globally unique: partition index * 2^40 + local
bin) and ``bin_tokens`` (the running bin total). Oversized single
documents (> budget) get their own bin and are flagged ``oversize``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["greedy_pack"]

_PARTITION_STRIDE = 1 << 40


def greedy_pack(
    df: DataFrame,
    token_col: str,
    budget: int,
    by: str | None = None,
) -> DataFrame:
    """Assign each row a ``bin_id`` such that each bin's ``token_col``
    sum is <= ``budget`` (first-fit on the partition's arrival order).

    ``by`` repartitions by a grouping column first so bins never span
    groups (e.g. pack per language). Rows with null/negative token
    counts are treated as 0.
    """
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    if token_col not in df.columns:
        raise ValueError(f"token_col {token_col!r} not in DataFrame")

    # co-locate and cluster each group: several groups can share a hash
    # partition, so bins must also break on the group boundary (handled
    # in the packer via the group value)
    src = df.repartition(by).sortWithinPartitions(by) if by else df
    schema = T.StructType(
        list(src.schema.fields)
        + [
            T.StructField("bin_id", T.LongType()),
            T.StructField("bin_tokens", T.LongType()),
            T.StructField("oversize", T.BooleanType()),
        ]
    )

    def pack(pid: int, batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = pid * _PARTITION_STRIDE
        next_bin = 0
        cur_bin = None
        cur_total = 0
        cur_group = object()  # sentinel != any real value
        for pdf in batches:
            if pdf.empty:
                continue
            bin_ids, bin_totals, oversize = [], [], []
            groups = pdf[by] if by else [None] * len(pdf)
            for tok, grp in zip(
                pdf[token_col].fillna(0).astype(int).clip(lower=0), groups
            ):
                if by and grp != cur_group:
                    cur_group = grp
                    cur_bin = None  # bins never span group boundaries
                if tok > budget:
                    bin_ids.append(base + next_bin)
                    bin_totals.append(int(tok))
                    oversize.append(True)
                    next_bin += 1
                    continue
                if cur_bin is None or cur_total + tok > budget:
                    cur_bin = next_bin
                    next_bin += 1
                    cur_total = 0
                cur_total += int(tok)
                bin_ids.append(base + cur_bin)
                bin_totals.append(cur_total)
                oversize.append(False)
            yield pdf.assign(
                bin_id=bin_ids, bin_tokens=bin_totals, oversize=oversize
            )

    # mapInPandas has no partition-id arg; smuggle it via
    # spark_partition_id column
    with_pid = src.withColumn("_pid", F.spark_partition_id())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gen = None
        pid = None
        pending = []
        for pdf in batches:
            if pdf.empty:
                continue
            pid = int(pdf["_pid"].iloc[0])
            pending.append(pdf.drop(columns=["_pid"]))
        if pid is None:
            return
        yield from pack(pid, iter(pending))

    return with_pid.mapInPandas(run, schema=schema)
