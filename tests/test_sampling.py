"""Unit tests for deterministic sampling operators; sf0.01 oracle
equivalence is covered by test_entry.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.sampling import (
    sample_key,
    stratified_sample_exact,
    weighted_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"s{i % 3}", f"text {i}") for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_stratified_exact_quota(docs):
    out = stratified_sample_exact(docs, "source", 7)
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"s0": 7, "s1": 7, "s2": 7}


def test_stratified_small_stratum_keeps_all(spark):
    rows = [(1, "a"), (2, "a"), (3, "b")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample_exact(df, "source", 5)
    assert out.count() == 3  # quotas larger than strata keep everything


def test_stratified_deterministic_under_repartition(docs):
    a = sorted(r.doc_id for r in stratified_sample_exact(docs, "source", 9).collect())
    b = sorted(
        r.doc_id
        for r in stratified_sample_exact(docs.repartition(13), "source", 9).collect()
    )
    assert a == b


def test_salt_changes_selection(docs):
    a = set(r.doc_id for r in stratified_sample_exact(docs, "source", 5).collect())
    b = set(
        r.doc_id
        for r in stratified_sample_exact(docs, "source", 5, salt="v2").collect()
    )
    assert a != b  # different salt -> different (but still deterministic) draw


def test_weighted_sample_uniform_fraction(docs):
    n = weighted_sample(docs, 0.5, id_col="doc_id").count()
    assert 100 <= n <= 200  # 300 rows at p=0.5, md5 keys are uniform-ish


def test_weighted_sample_per_stratum(docs):
    out = weighted_sample(
        docs, {"s0": 1.0, "s1": 0.0}, stratum_col="source", id_col="doc_id"
    )
    got = {r.source for r in out.select("source").distinct().collect()}
    assert got == {"s0"}  # s1 weighted 0, s2 missing -> default 0
    assert out.count() == 100  # weight 1.0 keeps the whole stratum


def test_weighted_sample_validation(docs):
    with pytest.raises(ValueError):
        weighted_sample(docs, 1.5)
    with pytest.raises(ValueError):
        weighted_sample(docs, {"s0": 2.0}, stratum_col="source")
    with pytest.raises(ValueError):
        weighted_sample(docs, {"s0": 0.5})  # mapping without stratum_col
    with pytest.raises(ValueError):
        stratified_sample_exact(docs, "source", 0)


def test_sample_key_range(docs):
    mn, mx = docs.select(
        F.min(sample_key("doc_id")).alias("a"), F.max(sample_key("doc_id")).alias("b")
    ).first()
    assert 0.0 <= mn and mx < 1.0


def test_plan_mixture_keep_probs_and_sample(spark):
    from mlx_vector_db_spark.operators.sampling import plan_mixture

    rows = [(i, "web", 100) for i in range(50)] + [
        (100 + i, "code", 100) for i in range(10)
    ] + [(200 + i, "junk", 100) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars int")
    plan, sampled = plan_mixture(
        df, {"web": 2500.0, "code": 99999.0}, weight_col="n_chars"
    )
    p = {r.stratum: r for r in plan.collect()}
    assert p["web"].keep_prob == pytest.approx(0.5)     # 2500 of 5000
    assert p["code"].keep_prob == 1.0                   # clamped shortfall
    assert p["code"].available == 1000.0
    assert p["junk"].keep_prob == 0.0                   # absent target drops
    got = {r.doc_id for r in sampled.collect()}
    assert got and all(100 <= d < 110 or d < 50 for d in got)
    assert {d for d in got if d >= 100} == set(range(100, 110))  # all code kept
    # deterministic under repartition
    _, s2 = plan_mixture(
        df.repartition(7), {"web": 2500.0, "code": 99999.0}, weight_col="n_chars"
    )
    assert {r.doc_id for r in s2.collect()} == got
    with pytest.raises(ValueError, match=">= 0"):
        plan_mixture(df, {"web": -1.0})
