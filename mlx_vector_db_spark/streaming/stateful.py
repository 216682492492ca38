"""Custom stateful streaming operators via applyInPandasWithState.

The reference keeps per-store running counters in process memory
(vector_count, rolling latency means — service/optimized_vector_store.py
:105, main.py:140-148); that state dies with the process and cannot
shard. The streaming-native rebuild keeps equivalent state in Spark's
state store: per-key state survives restarts via the checkpoint, shards
by key hash, and is bounded by timeouts.

``running_user_totals`` is the canonical shape: per user, a running
(count, sum, max) over an unbounded event stream, emitted every time the
key sees new data. Any custom accumulator (per-tenant quotas, embedding
ingest counters, rolling quality stats) drops into the same skeleton.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running aggregates over a stream (update mode).

    Input needs ``user_id`` and ``value`` columns. Each micro-batch
    emits one row per user *seen in that batch* with the running totals
    accumulated across all batches so far.
    """

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            vals = pdf["value"].astype(float)
            n += len(vals)
            total += float(vals.sum())
            if len(vals):
                mx = max(mx, float(vals.max()))
        state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
