"""Bucketed co-located joins — removing the fact⋈fact shuffle.

At 100 TB the one join this engine cannot broadcast is fact⋈fact
(orders⋈lineitem, queries⋈candidates). Bucketing both sides by the join
key at write time (`bucketBy(n, key).sortBy(key).saveAsTable`) makes the
join a zero-Exchange SortMergeJoin: each task reads matching bucket
files from both tables and merges locally. This is the table-layout
investment SCALE.md flags; the cost is paid once at ingest, every
subsequent join on the key is shuffle-free.

`tests/test_bucketing.py` asserts the physical plan: bucketed join has
no Exchange; the same join unbucketed has two.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table.

    Idempotent: drops any existing table AND clears an orphaned
    warehouse location (the in-memory catalog forgets tables across
    sessions but the warehouse directory survives)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    leftover = Path(warehouse) / table.lower()
    if leftover.exists():
        shutil.rmtree(leftover, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with :func:`write_bucketed`
    with the same bucket count on ``key`` — planner elides both
    Exchanges (and both Sorts when bucket-sorted)."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)
