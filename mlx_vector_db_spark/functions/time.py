"""Event-time normalization shared by the batch and streaming paths.

The synthetic ``events`` table's ``ts`` column has shipped under three
different physical parquet encodings across test-data generations:

1. ``TIMESTAMP(NANOS)`` — Spark's parquet reader can't decode nanos
   directly; with ``spark.sql.legacy.parquet.nanosAsLong=true`` it
   surfaces as a raw ``LongType`` of epoch nanoseconds.
2. ``timestamp[us]`` without timezone — surfaces as ``TIMESTAMP_NTZ``
   (Spark 4 infers NTZ by default). Functions like ``unix_micros``
   reject NTZ, so it must be cast to a zoned timestamp; the session
   timezone is pinned to UTC (session.py), making the cast lossless.
3. ``timestamp[us, tz=UTC]`` — plain ``TimestampType``, used as-is.

``event_time_col`` maps any of the three to a session-zoned
``TimestampType`` column, so every downstream consumer (windowing,
as-of joins, watermarks, ``unix_micros``) sees one canonical type.
A schema drift here previously broke the as-of join, the streaming
parity suite, and the benchmark in one shot — never branch on the
encoding anywhere else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def event_time_col(df: DataFrame, col: str = "ts") -> Column:
    """Canonical event-time expression for ``df[col]`` regardless of the
    parquet physical encoding (see module docstring). Pure projection —
    no shuffle, stays inside whole-stage codegen."""
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        # integral `div`, NOT `/`: epoch nanos (~1.7e18) exceed a
        # double's 2^53 exact-integer range, so float division is off
        # by up to a microsecond
        return F.timestamp_micros(F.expr(f"`{col}` div 1000"))
    if isinstance(dt, T.TimestampNTZType):
        # session tz is pinned UTC, so NTZ wall-clock == UTC instant
        return F.col(col).cast("timestamp")
    if isinstance(dt, T.TimestampType):
        return F.col(col)
    raise TypeError(
        f"column {col!r} has unsupported event-time type {dt.simpleString()}; "
        "expected long (epoch nanos), timestamp_ntz, or timestamp"
    )
