"""Unit tests for hybrid retrieval (BM25 + RRF) on hand-computed
fixtures; sf0.01 oracle equivalence is covered by test_entry.py."""

from __future__ import annotations

import math

import pytest

from mlx_vector_db_spark.operators.hybrid import bm25_scores, bm25_topk, rrf_fuse


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_hand_computed(spark):
    df = _docs(spark, [(1, "a a b"), (2, "b c"), (3, "a b b b")])
    out = {r.doc_id: r.score for r in bm25_scores(df, ["a"]).collect()}
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))  # N=3, df=2
    # avgdl = 3; d1: tf=2, dl=3 ; d3: tf=1, dl=4
    exp1 = idf * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3 / 3))
    exp3 = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 4 / 3))
    assert set(out) == {1, 3}  # d2 matches no term -> absent
    assert out[1] == pytest.approx(exp1)
    assert out[3] == pytest.approx(exp3)


def test_bm25_topk_rank_deterministic(spark):
    df = _docs(spark, [(1, "a a b"), (2, "b c"), (3, "a b b b"), (4, "a a b")])
    # docs 1 and 4 have identical text -> identical score -> id tiebreak
    rows = {r.doc_id: r.rank for r in bm25_topk(df, ["a"], k=3).collect()}
    assert rows[1] == 1 and rows[4] == 2 and rows[3] == 3


def test_bm25_case_insensitive_terms(spark):
    df = _docs(spark, [(1, "Spark JOIN fast")])
    out = bm25_scores(df, ["Join"]).collect()
    assert len(out) == 1 and out[0].doc_id == 1


def test_bm25_rejects_empty(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        bm25_scores(df, [])
    with pytest.raises(ValueError):
        bm25_topk(df, ["a"], k=0)


def test_rrf_fuse_hand_computed(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "id long, rank int")
    b = spark.createDataFrame([(2, 1)], "id long, rank int")
    out = {r.id: r for r in rrf_fuse({"a": a, "b": b}).collect()}
    assert out[2].rrf_score == pytest.approx(1 / 61 + 1 / 62)
    assert out[1].rrf_score == pytest.approx(1 / 61)
    assert out[2].n_arms == 2 and out[1].n_arms == 1
    assert out[2].rank == 1 and out[1].rank == 2


def test_rrf_rejects_empty(spark):
    with pytest.raises(ValueError):
        rrf_fuse({})
