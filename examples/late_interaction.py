#!/usr/bin/env python
"""Runnable tour of the r11 late-interaction (MaxSim) retrieval stack.

Documents and queries are SETS of token vectors; score(q, d) is the
ColBERT objective: sum over query tokens of the best-matching doc
token's cosine. Three tiers, composable:

1. exact MaxSim — declarative expression plan for small query batches,
   auto-delegated to the packed-doc BLAS sweep past 256 query tokens;
2. the PLAID-shaped funnel — sign-bit token codes (32x fewer bytes,
   zero FLOPs in pass 1) + exact re-rank;
3. MMR diversity rerank over the MaxSim pool (mean-token-vector doc
   representative).

Run:  python examples/late_interaction.py  [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from mlx_vector_db_spark.operators.bq import train_bq
from mlx_vector_db_spark.operators.maxsim import (
    maxsim_funnel,
    maxsim_join,
    pack_doc_token_codes,
    pack_doc_tokens,
)
from mlx_vector_db_spark.operators.mmr import mmr_rerank
from mlx_vector_db_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("late-interaction-example")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # token tables: 4 consecutive vec_ids = one doc / one query
    docs = emb.select(
        F.floor(F.col("vec_id") / F.lit(4)).cast("long").alias("doc_id"),
        "embedding",
    )
    queries = emb.where("vec_id < 8").select(
        F.floor(F.col("vec_id") / F.lit(4)).cast("long").alias("query_id"),
        "embedding",
    )

    print("== exact MaxSim (expression plan at this batch size) ==")
    exact = maxsim_join(docs, queries, k=5)
    exact.orderBy("query_id", "rank").show()

    print("== packed-doc layout (store once, sweep many) ==")
    packed = pack_doc_tokens(docs)
    maxsim_join(
        packed, queries, k=5, strategy="blocked", doc_tokens_packed=True
    ).orderBy("query_id", "rank").show(5)

    print("== PLAID-shaped funnel: sign-bit Hamming pass + exact rerank ==")
    bq = train_bq(docs, seed=42)
    codes = pack_doc_token_codes(docs, bq)  # 32x fewer bytes than floats
    maxsim_funnel(codes, docs, queries, bq, k=5, overfetch=8).orderBy(
        "query_id", "rank"
    ).show(5)

    print("== MMR diversity over the MaxSim pool ==")
    pool = maxsim_join(docs, queries, k=20)
    centroid = (
        docs.groupBy("doc_id")
        .agg(
            F.aggregate(
                F.collect_list("embedding"),
                F.array_repeat(F.lit(0.0), 64),
                lambda acc, v: F.zip_with(
                    acc, v, lambda a, b: a + b.cast("double")
                ),
            ).alias("sum_vec"),
            F.count(F.lit(1)).alias("n_tok"),
        )
        .select(
            "doc_id",
            F.transform("sum_vec", lambda x: x / F.col("n_tok")).alias(
                "embedding"
            ),
        )
    )
    cand = pool.join(centroid, on="doc_id").select(
        "query_id",
        F.col("doc_id").alias("id"),
        "embedding",
        F.col("score").alias("similarity"),
    )
    mmr_rerank(cand, k=5, lambda_=0.5).orderBy("query_id", "rank").show(5)

    # 4. r12: the same stack store-native (tokens persisted packed,
    #    codes maintained on add, saturation-aware query dispatch)
    store_tier_tour(spark, sf_dir)
    return 0




def store_tier_tour(spark, sf_dir):  # pragma: no cover - example code
    """r12: the same stack as a FIRST-CLASS store capability — tokens
    persisted packed, codes built once and maintained on add, queries
    routed through saturation-aware dispatch."""
    import tempfile

    from mlx_vector_db_spark.store import VectorStoreCatalog

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cat = VectorStoreCatalog(spark, tempfile.mkdtemp(prefix="li-store-"))
    st = cat.create_store("demo", "tokens", dimension=64)
    st.add_token_vectors(
        emb.select(
            (F.col("vec_id") / 4).cast("long").alias("doc_id"), "embedding"
        )
    )
    st.build_token_codes()  # sign-bit funnel artifact, persisted
    q_toks = [r["embedding"] for r in emb.where("vec_id < 4").collect()]
    # one query as a plain list of token vectors; funnel=None lets the
    # engine pick (exact here — the candidate budget saturates a small
    # corpus, and a saturated two-pass plan is strictly worse)
    st.maxsim_query(q_toks, k=5).show()

if __name__ == "__main__":
    raise SystemExit(main())
