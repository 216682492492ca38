"""Cross-encoder rerank — the precision stage after candidate retrieval.

A retrieval stack's last hop scores each (query, document) PAIR with a
model that reads both texts together (a cross-encoder), which beats
bi-encoder cosine on precision but costs a forward pass per pair — so
it only ever runs on the candidate pool (tens of rows per query), never
the corpus. The reference's RAG flow stops at vector top-k
(integrations/mlx_lm_pipeline.py); this stage is the standard
beyond-reference addition (the sentence-transformers CrossEncoder
pattern — public API).

Spark-first: candidates arrive from ANY retrieval tier (BM25, exact
kNN, BQ/PQ two-pass, hybrid RRF — anything yielding query/doc text
pairs); scoring runs as ``mapInPandas`` over the pair frame — one
Arrow batch per model call, thousands of pairs per invocation — and
the final cut is the engine's standard ``top_k_per_group``. The model
is pluggable through the same contract as ``pipeline.py``'s encoder:
a callable ``(pd.Series, pd.Series) -> np.ndarray`` of scores.

Two scorers ship:
- :class:`CrossEncoderScorer` — real model when ``sentence_transformers``
  is installed (it is NOT in this container; the class raises a clear
  ImportError at construction, the honest pipeline.py gate).
- :class:`TokenOverlapScorer` — the deterministic fallback: Jaccard
  overlap of lowercased whitespace token SETS. Fully SQL-replicable,
  which is what lets the driver hash-check the whole stage end-to-end
  (queries.q_rerank_topk's DuckDB oracle re-derives every score).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.topk import top_k_per_group

__all__ = ["TokenOverlapScorer", "CrossEncoderScorer", "cross_encoder_rerank"]


class TokenOverlapScorer:
    """Deterministic pair scorer: Jaccard of distinct lowercase
    whitespace tokens. Not a quality model — a reproducible stand-in
    with the exact contract a cross-encoder has (pair text in, float
    score out), so the distributed plumbing is testable bit-for-bit
    on any engine (the RandomProjectionEncoder discipline,
    pipeline.py)."""

    #: ASCII whitespace only, on purpose: python's str.split()/regex \s
    #: match Unicode whitespace that RE2 (DuckDB/Spark) does not, which
    #: would silently break the cross-engine score parity the oracle
    #: hash-checks. Scores are ratios of integer counts, so the float64
    #: division is bit-identical on every engine.
    _WS = __import__("re").compile(r"[ \t\n\r\f\v]+")

    def _tokens(self, s: str) -> set[str]:
        return {t for t in self._WS.split(str(s).lower()) if t}

    def __call__(self, queries: pd.Series, docs: pd.Series) -> np.ndarray:
        out = np.empty(len(queries), dtype=np.float64)
        for i, (q, d) in enumerate(zip(queries, docs)):
            qt = self._tokens(q)
            dt = self._tokens(d)
            union = len(qt | dt)
            out[i] = (len(qt & dt) / union) if union else 0.0
        return out


class CrossEncoderScorer:
    """Real cross-encoder via sentence-transformers (optional dep)."""

    def __init__(self, model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2"):
        try:
            from sentence_transformers import CrossEncoder
        except ImportError as exc:  # pragma: no cover - dep not in container
            raise ImportError(
                "sentence_transformers is not installed; use "
                "TokenOverlapScorer for deterministic plumbing tests"
            ) from exc
        self._model = CrossEncoder(model_name)  # pragma: no cover

    def __call__(self, queries, docs):  # pragma: no cover - dep-gated
        return np.asarray(
            self._model.predict(list(zip(queries, docs)), convert_to_numpy=True),
            dtype=np.float64,
        )


def cross_encoder_rerank(
    candidates: DataFrame,
    scorer: Callable[[pd.Series, pd.Series], np.ndarray] | None = None,
    k: int = 10,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    id_col: str = "id",
    doc_text_col: str = "text",
) -> DataFrame:
    """Score every candidate pair and keep the top-k per query.

    ``candidates`` carries (query_id, query_text, id, doc text) — the
    join of any retrieval tier's output with the document texts.
    Output: (query_id, id, rerank_score, rank), ties broken on id ASC
    (engine-independent ordering, the MMR discipline). NULL texts are
    excluded up front, matching the kNN NULL-vector rule.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    score = scorer if scorer is not None else TokenOverlapScorer()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            s = np.asarray(
                score(pdf[query_text_col], pdf[doc_text_col]), dtype=np.float64
            )
            yield pd.DataFrame(
                {
                    query_id_col: pdf[query_id_col],
                    id_col: pdf[id_col],
                    "rerank_score": s,
                }
            )

    pool = candidates.select(
        query_id_col, query_text_col, id_col, doc_text_col
    ).where(
        F.col(query_text_col).isNotNull() & F.col(doc_text_col).isNotNull()
    )
    scored = pool.mapInPandas(
        run,
        schema=f"{query_id_col} long, {id_col} long, rerank_score double",
    )
    order = [F.col("rerank_score").desc(), F.col(id_col).asc()]
    return top_k_per_group(scored, [query_id_col], order, int(k)).select(
        query_id_col, id_col, "rerank_score", "rank"
    )
