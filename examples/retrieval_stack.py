#!/usr/bin/env python
"""The r10 retrieval stack end-to-end: the composition a production
retrieval service runs, each stage swappable and each measured at
decade scale in SCALE.md.

    stage 1  candidate generation   32x-compressed BQ Hamming scan
                                    (swap in IVF-PQ / exact kNN freely)
    stage 2  exact re-rank          semi-join float rows, true scores
    stage 3  diversity              MMR greedy selection per query
    stage 4  precision rerank       cross-encoder stage (deterministic
                                    token-overlap stand-in here; plug
                                    a real CrossEncoderScorer in prod)

    python examples/retrieval_stack.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from mlx_vector_db_spark.operators.bq import bq_search_batch, train_bq  # noqa: E402
from mlx_vector_db_spark.operators.mmr import mmr_rerank  # noqa: E402
from mlx_vector_db_spark.operators.rerank import cross_encoder_rerank  # noqa: E402
from mlx_vector_db_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("retrieval-stack")

    vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), "embedding"
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # ---- stages 1+2: compressed candidates + exact re-rank ----------
    bq = train_bq(vec)
    coded = bq.encode(vec).localCheckpoint(eager=False)
    queries = coded.where(F.col("id") < 3).select(
        F.col("id").alias("query_id"), "embedding"
    )
    pool = bq_search_batch(coded, queries, bq, k=40, overfetch=16)
    print("-- stage 1+2: BQ candidates, exact-re-ranked (top 3 shown) --")
    pool.where(F.col("rank") <= 3).orderBy("query_id", "rank").show()

    # ---- stage 3: MMR diversity over the pool -----------------------
    mmr_pool = pool.select("query_id", "id", "similarity").join(vec, on="id")
    diverse = mmr_rerank(mmr_pool, k=8, lambda_=0.5)
    print("-- stage 3: MMR-diversified top-8 --")
    diverse.orderBy("query_id", "rank").show(8)

    # ---- stage 4: cross-encoder precision rerank over doc texts -----
    # ids map 1:1 to documents in the synthetic corpus
    qtext = docs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    cand_text = (
        diverse.select("query_id", "id")
        .join(docs.select(F.col("doc_id").alias("id"), "text"), on="id")
        .join(qtext, on="query_id")
    )
    final = cross_encoder_rerank(cand_text, k=5)
    print("-- stage 4: precision-reranked top-5 --")
    final.orderBy("query_id", "rank").show(15)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
