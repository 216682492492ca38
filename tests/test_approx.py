"""Approximate aggregates: error-bound tests against exact values (the
approx functions can't hash-match a DuckDB oracle — different sketches —
so they get bound assertions on real data instead).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def lineitem(spark, sf_medium):
    return spark.read.parquet(f"{sf_medium}/lineitem.parquet").cache()


def test_approx_count_distinct_within_rsd(lineitem):
    exact = lineitem.select(F.countDistinct("l_orderkey")).first()[0]
    approx = lineitem.select(
        F.approx_count_distinct("l_orderkey", rsd=0.02)
    ).first()[0]
    assert abs(approx - exact) / exact < 0.06  # 3x the configured rsd


def test_percentile_approx_close_to_exact(lineitem):
    exact = lineitem.select(
        F.expr("percentile(l_extendedprice, 0.5)")
    ).first()[0]
    approx = lineitem.select(
        F.percentile_approx("l_extendedprice", 0.5, 10_000)
    ).first()[0]
    assert approx == pytest.approx(exact, rel=0.01)


def test_approx_quantiles_monotone(lineitem):
    qs = lineitem.approxQuantile("l_extendedprice", [0.1, 0.5, 0.9], 0.01)
    assert qs == sorted(qs)
    lo, hi = lineitem.select(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
    assert lo <= qs[0] and qs[-1] <= hi
