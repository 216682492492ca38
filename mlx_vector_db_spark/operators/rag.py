"""RAG retrieval: context selection + greedy packing + prompt assembly.

Reference semantics (integrations/mlx_lm_pipeline.py:725-765):
``retrieve_context(query, k, min_similarity=0.7, max_context_length)``
fetches ``k*2`` nearest chunks, keeps those with similarity >= the
threshold, walks the first ``k`` of them best-first and keeps a chunk
iff the running total of kept text lengths stays within
``max_context_length`` — overflowing chunks are *skipped*, not a break,
so a later shorter chunk can still be packed (:741-752).

Spark-first: over-fetch + threshold are DataFrame ops; the greedy
skip-walk is inherently sequential but over <= k rows, so it runs as a
grouped-map Pandas UDF on exactly those rows (per query — in batch
mode every query's pack runs in parallel). Nothing ever collects more
than the final context rows.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mlx_vector_db_spark.operators.knn import knn_query

__all__ = ["retrieve_context", "pack_context", "format_rag_prompt"]


def pack_context(
    hits: DataFrame,
    k: int,
    max_context_length: int,
    text_col: str = "chunk_text",
    group_col: str = "query_id",
) -> DataFrame:
    """Greedy skip-packing (reference :741-752) per ``group_col``.

    Input must carry ``rank`` (walk order) and ``text_col``; rows beyond
    rank k are ignored. Output = kept rows + ``context_rank``.
    """
    rows = hits.where(F.col("rank") <= F.lit(int(k)))
    # NB: StructType.add mutates in place — build a fresh StructType so the
    # input DataFrame's schema object is left alone
    schema = T.StructType(
        list(rows.schema.fields) + [T.StructField("context_rank", T.IntegerType())]
    )
    budget = int(max_context_length)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rank")
        kept_idx, total = [], 0
        for i, length in zip(pdf.index, pdf[text_col].str.len()):
            if total + int(length) <= budget:
                kept_idx.append(i)
                total += int(length)
        out = pdf.loc[kept_idx].copy()
        out["context_rank"] = range(1, len(out) + 1)
        return out

    return rows.groupBy(group_col).applyInPandas(pack, schema=schema)


def retrieve_context(
    chunks: DataFrame,
    query_vector: Sequence[float],
    k: int = 5,
    min_similarity: float = 0.7,
    max_context_length: int = 2000,
    metric: str = "cosine",
    text_col: str = "chunk_text",
    id_col: str = "id",
    vec_col: str = "embedding",
    norm_col: str | None = None,
) -> DataFrame:
    """Packed context chunks for one query (reference defaults:
    ``min_similarity=0.7``, ``max_context_length=2000``)."""
    hits = (
        knn_query(
            chunks,
            query_vector,
            k=k * 2,  # over-fetch, reference :733
            metric=metric,
            vec_col=vec_col,
            id_col=id_col,
            norm_col=norm_col,
        )
        .where(F.col("similarity") >= F.lit(float(min_similarity)))
        .withColumn("query_id", F.lit(0))
    )
    # re-rank after the threshold filter: the walk order is over the
    # *filtered* list (reference :736-741); input is <= 2k rows post-limit
    from mlx_vector_db_spark.operators.topk import bounded_global_rank

    hits = bounded_global_rank(hits.withColumnRenamed("rank", "_prelim_rank"),
                               [F.col("_prelim_rank")]).drop("_prelim_rank")
    return pack_context(
        hits, k=k, max_context_length=max_context_length, text_col=text_col
    ).drop("query_id")


def format_rag_prompt(
    context_rows: Sequence,
    question: str,
    text_col: str = "chunk_text",
    source_col: str | None = "source",
    system_prompt: str = "Answer the question using only the context below.",
) -> str:
    """Source-attributed prompt block (reference :767-791 shape, English
    canonical text). Driver-side assembly over the <=k context rows."""
    blocks = []
    for i, row in enumerate(context_rows, start=1):
        src = (
            row[source_col]
            if source_col and source_col in row.__fields__
            else f"chunk {i}"
        )
        blocks.append(f"[Source {i}: {src}]\n{row[text_col]}\n")
    context = "\n".join(blocks)
    return (
        f"{system_prompt}\n\n"
        f"Context:\n{context}\n\n"
        f"Question: {question}\n\n"
        "Answer based on the context:"
    )
