"""As-of join vs pandas merge_asof oracle + edge semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mlx_vector_db_spark.operators.asof import asof_join

RNG = np.random.default_rng(23)


@pytest.fixture(scope="module")
def frames():
    n_l, n_r = 300, 80
    left = pd.DataFrame(
        {
            "key": RNG.integers(0, 4, n_l),
            "ts": RNG.integers(0, 10_000, n_l),
            "lval": np.arange(n_l),
        }
    ).drop_duplicates(["key", "ts"])
    right = pd.DataFrame(
        {
            "key": RNG.integers(0, 4, n_r),
            "ts": RNG.integers(0, 10_000, n_r),
            "rval": RNG.random(n_r).round(4),
        }
    ).drop_duplicates(["key", "ts"])
    return left, right


def test_asof_matches_pandas_merge_asof(spark, frames):
    left, right = frames
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = asof_join(ldf, rdf, on="ts", by="key").toPandas()

    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="key",
        direction="backward",
    )
    g = got.sort_values("lval").reset_index(drop=True)
    e = exp.sort_values("lval").reset_index(drop=True)
    assert len(g) == len(e) == len(left)
    for i in range(len(e)):
        gv, ev = g.loc[i, "rval_right"], e.loc[i, "rval"]
        assert (pd.isna(gv) and pd.isna(ev)) or gv == pytest.approx(ev)


def test_equal_timestamp_matches_inclusively(spark):
    ldf = spark.createDataFrame([(1, 100, "L")], "key int, ts long, l string")
    rdf = spark.createDataFrame([(1, 100, "R")], "key int, ts long, r string")
    row = asof_join(ldf, rdf, on="ts", by="key").first()
    assert row["r_right"] == "R" and row["ts_right"] == 100


def test_no_prior_row_is_null(spark):
    ldf = spark.createDataFrame([(1, 50, "L")], "key int, ts long, l string")
    rdf = spark.createDataFrame([(1, 100, "R")], "key int, ts long, r string")
    row = asof_join(ldf, rdf, on="ts", by="key").first()
    assert row["r_right"] is None and row["ts_right"] is None


def test_keys_do_not_leak_across_groups(spark):
    ldf = spark.createDataFrame([(1, 200, "L")], "key int, ts long, l string")
    rdf = spark.createDataFrame([(2, 100, "R")], "key int, ts long, r string")
    row = asof_join(ldf, rdf, on="ts", by="key").first()
    assert row["r_right"] is None


def test_validation(spark):
    ldf = spark.createDataFrame([(1, 1)], "a int, ts long")
    rdf = spark.createDataFrame([(1, 1)], "a int, nope long")
    with pytest.raises(ValueError, match="must exist"):
        asof_join(ldf, rdf, on="ts", by="a")


def test_single_shuffle_plan(spark, frames):
    from mlx_vector_db_spark.plans import explain_str

    left, right = frames
    plan = explain_str(
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                  on="ts", by="key")
    )
    # one hash-partition exchange per side feeding ONE window — no
    # range/cross join anywhere
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("Window") >= 1
