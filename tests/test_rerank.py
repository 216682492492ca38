"""Cross-encoder rerank stage: deterministic token-overlap scorer vs a
pure-python oracle, custom-scorer pluggability, NULL-text exclusion,
tie-break determinism, dep-gated real model."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.rerank import (
    CrossEncoderScorer,
    TokenOverlapScorer,
    cross_encoder_rerank,
)


@pytest.fixture(scope="module")
def cand(spark):
    docs = [
        (0, "the quick brown fox jumps"),
        (1, "the quick brown dog sleeps"),
        (2, "lorem ipsum dolor sit amet"),
        (3, "THE QUICK  brown\tfox jumps"),  # case/whitespace twin of 0
        (4, ""),
    ]
    queries = [(100, "the quick brown fox jumps"), (101, "lorem ipsum")]
    qdf = spark.createDataFrame(queries, "query_id long, query_text string")
    ddf = spark.createDataFrame(docs, "id long, text string")
    return qdf.crossJoin(ddf)


def test_scores_match_python_oracle(cand):
    out = cross_encoder_rerank(cand, k=5).collect()
    scorer = TokenOverlapScorer()
    rows = cand.collect()
    import pandas as pd

    want = {}
    for r in rows:
        s = scorer(pd.Series([r["query_text"]]), pd.Series([r["text"]]))[0]
        want[(r["query_id"], r["id"])] = s
    for r in out:
        assert r["rerank_score"] == pytest.approx(
            want[(r["query_id"], r["id"])], abs=0
        )


def test_case_and_whitespace_insensitive(cand):
    out = {
        (r["query_id"], r["id"]): r["rerank_score"]
        for r in cross_encoder_rerank(cand, k=5).collect()
    }
    # doc 3 is doc 0 up to case/whitespace: identical score, rank by id
    assert out[(100, 0)] == out[(100, 3)] == 1.0
    ranks = {
        (r["query_id"], r["id"]): r["rank"]
        for r in cross_encoder_rerank(cand, k=5).collect()
    }
    assert ranks[(100, 0)] == 1 and ranks[(100, 3)] == 2  # id ASC tie-break


def test_empty_text_scores_zero_not_crash(cand):
    out = {
        (r["query_id"], r["id"]): r["rerank_score"]
        for r in cross_encoder_rerank(cand, k=5).collect()
    }
    assert out[(100, 4)] == 0.0


def test_null_text_excluded(spark):
    qdf = spark.createDataFrame([(1, "a b")], "query_id long, query_text string")
    ddf = spark.createDataFrame(
        [(0, "a b"), (1, None)], "id long, text string"
    )
    out = cross_encoder_rerank(qdf.crossJoin(ddf), k=5).collect()
    assert [r["id"] for r in out] == [0]


def test_custom_scorer_pluggable(cand):
    def length_scorer(queries, docs):
        return np.asarray([float(len(str(d))) for d in docs])

    out = cross_encoder_rerank(cand, scorer=length_scorer, k=1).collect()
    top = {r["query_id"]: r["id"] for r in out}
    # longest doc wins for every query
    assert set(top.values()) == {1}  # "the quick brown dog sleeps" is longest


def test_k_validation(cand):
    with pytest.raises(ValueError, match="k must be"):
        cross_encoder_rerank(cand, k=0)


def test_real_model_gated():
    with pytest.raises(ImportError, match="sentence_transformers"):
        CrossEncoderScorer()
