"""RAG retrieval vs a pure-Python oracle of the reference's packing walk
(integrations/mlx_lm_pipeline.py:725-765): over-fetch 2k, threshold,
walk first k, skip-on-overflow packing.
"""

from __future__ import annotations

import numpy as np
import pytest

from mlx_vector_db_spark.functions.vector import NORM_EPS
from mlx_vector_db_spark.operators.rag import (
    format_rag_prompt,
    retrieve_context,
)

DIM = 8
RNG = np.random.default_rng(21)


@pytest.fixture(scope="module")
def chunks_np():
    return RNG.random((40, DIM)).astype(np.float32)


@pytest.fixture(scope="module")
def chunks(spark, chunks_np):
    rows = [
        (i, chunks_np[i].tolist(), "x" * int(RNG.integers(50, 400)), f"doc_{i//4}.md")
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "id long, embedding array<float>, chunk_text string, source string"
    ).cache()


def py_oracle(chunks_rows, vecs, q, k, min_sim, max_len):
    V = vecs.astype(np.float64)
    qq = np.asarray(q, dtype=np.float64)
    vn = np.maximum(np.linalg.norm(V, axis=1), NORM_EPS)
    qn = max(np.linalg.norm(qq), NORM_EPS)
    sims = (V @ qq) / (vn * qn)
    order = np.lexsort((np.arange(len(V)), -sims))[: 2 * k]
    filtered = [i for i in order if sims[i] >= min_sim][:k]
    kept, total = [], 0
    for i in filtered:
        tlen = len(chunks_rows[i][2])
        if total + tlen <= max_len:
            kept.append(i)
            total += tlen
    return kept


@pytest.mark.parametrize("min_sim,max_len", [(0.0, 10_000), (0.7, 10_000), (0.0, 600)])
def test_retrieve_context_matches_oracle(spark, chunks, chunks_np, min_sim, max_len):
    rows = [(i, chunks_np[i].tolist(), r["chunk_text"]) for i, r in
            enumerate(chunks.orderBy("id").collect())]
    q = chunks_np[5].tolist()
    got = (
        retrieve_context(
            chunks, q, k=5, min_similarity=min_sim, max_context_length=max_len
        )
        .orderBy("context_rank")
        .collect()
    )
    exp = py_oracle(rows, chunks_np, q, 5, min_sim, max_len)
    assert [r["id"] for r in got] == exp
    assert [r["context_rank"] for r in got] == list(range(1, len(exp) + 1))


def test_skip_on_overflow_packs_later_chunk(spark):
    """A long rank-2 chunk is skipped but a short rank-3 chunk still
    packs — the defining difference from prefix-break packing."""
    vecs = [
        [1.0, 0.0], [0.99, 0.14], [0.97, 0.24], [0.0, 1.0],
    ]
    rows = [
        (0, vecs[0], "a" * 100, "s"),
        (1, vecs[1], "b" * 1000, "s"),
        (2, vecs[2], "c" * 50, "s"),
        (3, vecs[3], "d" * 10, "s"),
    ]
    df = spark.createDataFrame(
        rows, "id long, embedding array<float>, chunk_text string, source string"
    )
    got = (
        retrieve_context(df, [1.0, 0.0], k=3, min_similarity=0.0,
                         max_context_length=200)
        .orderBy("context_rank")
        .collect()
    )
    assert [r["id"] for r in got] == [0, 2]


def test_format_rag_prompt(spark, chunks, chunks_np):
    ctx = (
        retrieve_context(chunks, chunks_np[5].tolist(), k=2,
                         min_similarity=0.0, max_context_length=10_000)
        .orderBy("context_rank")
        .collect()
    )
    prompt = format_rag_prompt(ctx, "what is x?")
    assert "[Source 1: doc_1.md]" in prompt
    assert "Question: what is x?" in prompt
    assert prompt.index("[Source 1") < prompt.index("Question:")
