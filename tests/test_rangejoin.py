"""Range join vs the naive predicate-join oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.rangejoin import range_join
from mlx_vector_db_spark.plans import explain_str

RNG = np.random.default_rng(29)


@pytest.fixture(scope="module")
def data(spark):
    points = spark.createDataFrame(
        [(i, int(k), float(p)) for i, (k, p) in enumerate(
            zip(RNG.integers(0, 3, 400), RNG.random(400) * 1000)
        )],
        "pid long, grp int, x double",
    )
    iv = []
    for j in range(60):
        lo = float(RNG.random() * 950)
        iv.append((j, int(RNG.integers(0, 3)), lo, lo + float(RNG.random() * 80)))
    intervals = spark.createDataFrame(iv, "iid long, grp int, lo double, hi double")
    return points.cache(), intervals.cache()


def naive(points, intervals, by=None):
    cond = (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi"))
    if by:
        cond = cond & (points[by] == intervals[by])
    return {
        (r["pid"], r["iid"])
        for r in points.join(intervals.withColumnRenamed("grp", "g2"), cond if by is None else (
            (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi")) & (F.col("grp") == F.col("g2"))
        )).select("pid", "iid").collect()
    }


def test_range_join_matches_naive(spark, data):
    points, intervals = data
    got = {
        (r["pid"], r["iid"])
        for r in range_join(points.drop("grp"), intervals.drop("grp"),
                            "x", "lo", "hi").select("pid", "iid").collect()
    }
    exp = naive(points.drop("grp"), intervals.drop("grp"))
    assert got == exp and len(exp) > 0


def test_range_join_with_by_key(spark, data):
    points, intervals = data
    got = {
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "x", "lo", "hi", by="grp")
        .select("pid", "iid")
        .collect()
    }
    exp = naive(points, intervals, by="grp")
    assert got == exp and len(exp) > 0


def test_explicit_bucket_width_same_result(spark, data):
    points, intervals = data
    a = range_join(points.drop("grp"), intervals.drop("grp"), "x", "lo", "hi")
    b = range_join(points.drop("grp"), intervals.drop("grp"), "x", "lo", "hi",
                   bucket_width=7.3)
    assert {(r["pid"], r["iid"]) for r in a.select("pid", "iid").collect()} == {
        (r["pid"], r["iid"]) for r in b.select("pid", "iid").collect()
    }


def test_no_nested_loop_join_in_plan(spark, data):
    points, intervals = data
    plan = explain_str(range_join(points.drop("grp"), intervals.drop("grp"),
                                  "x", "lo", "hi", bucket_width=50.0))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_validation(spark, data):
    points, intervals = data
    with pytest.raises(ValueError, match="not in points"):
        range_join(points, intervals, "nope", "lo", "hi")
