"""Skew-safe shuffle operators: salted join / two-phase aggregation
equal their unsalted forms on pathologically skewed data, and the salt
actually scatters the hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.skew import salted_aggregate, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (0) holding 90% of rows + a long tail
    hot = spark.range(9000).select(
        F.lit(0).alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    tail = spark.range(1000).select(
        (F.col("id") % 50 + 1).alias("k"), F.lit(1.0).alias("v")
    )
    return hot.unionByName(tail).cache()


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(k, f"name-{k}") for k in range(51)], "k long, name string"
    )


def test_salted_join_matches_plain_join(spark, skewed, dim):
    plain = skewed.join(dim, on="k").groupBy("k", "name").count()
    salted = salted_join(skewed, dim, on="k", salt=8).groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark, skewed):
    right = spark.createDataFrame([(1, "one")], "k long, name string")
    out = salted_join(skewed, right, on="k", salt=4, how="left")
    assert out.count() == skewed.count()  # unmatched left rows survive
    assert out.where("k = 1 AND name IS NULL").count() == 0
    assert out.where("k = 0").first()["name"] is None


def test_salt_scatters_hot_key(spark, skewed, dim):
    """The hot key's rows must actually spread across salt buckets —
    the whole point of paying the right-side replication."""
    l = skewed.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8)).cast("int"),
    )
    buckets = l.where("k = 0").select("_salt").distinct().count()
    assert buckets >= 6  # 9000 rows over 8 buckets: all 8 expected


def test_salted_join_validation(spark, skewed, dim):
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(skewed, dim, on="k", how="full")
    with pytest.raises(ValueError, match="salt"):
        salted_join(skewed, dim, on="k", salt=1)
    with pytest.raises(ValueError, match="ambiguous"):
        salted_join(skewed, skewed, on="k")


def test_salted_aggregate_matches_direct(spark, skewed):
    direct = {
        (r["k"],): (r["n"], r["total"], r["lo"], r["hi"])
        for r in skewed.groupBy("k")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        (r["k"],): (r["n"], r["total"], r["lo"], r["hi"])
        for r in salted_aggregate(
            skewed,
            "k",
            {
                "n": ("count", "v"),
                "total": ("sum", "v"),
                "lo": ("min", "v"),
                "hi": ("max", "v"),
            },
            salt=16,
        ).collect()
    }
    assert direct == salted


def test_salted_aggregate_rejects_nonalgebraic(spark, skewed):
    with pytest.raises(ValueError, match="algebraic"):
        salted_aggregate(skewed, "k", {"bad": ("avg", "v")})


def test_reserved_salt_column_rejected(spark, skewed, dim):
    poisoned = skewed.withColumn("_salt", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        salted_join(poisoned, dim, on="k")
    with pytest.raises(ValueError, match="reserved"):
        salted_aggregate(poisoned, "k", {"n": ("count", "v")})
