#!/usr/bin/env python
"""End-to-end training-data pipeline over the documents table: the
composition a 100 TB corpus job runs, expressed as one lazy DataFrame
chain per stage so Catalyst fuses projections and every stage keeps its
scale shape (no collects between stages).

    stage 1  exact dedup            (one shuffle on md5 fingerprint)
    stage 2  near-dup removal       (MinHash banding, never all-pairs)
    stage 3  decontamination        (5-gram overlap vs eval split,
                                     hashed grams, broadcast eval side)
    stage 4  quality filtering      (Gopher repetition rules + langid,
                                     pure codegen expressions)
    stage 5  mixing                 (deterministic per-source quotas)
    stage 6  chunk + embed + store  (pandas-UDF chunker, 384-dim
                                     encoder, partitioned parquet store)

    python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    from mlx_vector_db_spark import get_spark
    from mlx_vector_db_spark.functions.text import chunk_documents, detect_language
    from mlx_vector_db_spark.operators.dedup import exact_dedup, minhash_dedup
    from mlx_vector_db_spark.operators.quality import (
        ngram_contamination,
        repetition_signals,
    )
    from mlx_vector_db_spark.operators.sampling import stratified_sample_exact
    from mlx_vector_db_spark.pipeline import RandomProjectionEncoder, embed_texts
    from mlx_vector_db_spark.store import VectorStoreCatalog

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("corpus-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. exact dedup: keep the smallest doc_id per normalized fingerprint
    keepers = exact_dedup(docs).select(F.col("keeper_id").alias("doc_id"))
    docs = docs.join(keepers, "doc_id", "left_semi")
    n1 = docs.count()

    # 2. near-dup removal (MinHash-LSH banding; drops the larger id of
    #    each surviving near-dup pair)
    docs = minhash_dedup(docs)
    n2 = docs.count()

    # 3. decontamination against the held-out eval split
    eval_df = docs.where(F.col("doc_id") % 20 == 0)
    train = docs.where(F.col("doc_id") % 20 != 0)
    dirty = ngram_contamination(train, eval_df, n=5).select("doc_id")
    docs = train.join(dirty, "doc_id", "left_anti")
    n3 = docs.count()

    # 4. quality gates: Gopher repetition caps + language check
    rep = repetition_signals(docs)
    good = rep.where(
        (F.col("top_word_frac") <= 0.20)
        & (F.col("top_bigram_frac") <= 0.18)
        & (F.col("dup_trigram_frac") <= 0.30)
    ).select("doc_id")
    docs = docs.join(good, "doc_id", "left_semi").where(
        detect_language("text") == F.col("lang")
    )
    n4 = docs.count()

    # 5. deterministic mixing: equal per-source quotas
    docs = stratified_sample_exact(docs, "source", 8)
    n5 = docs.count()

    # 6. chunk -> embed -> store
    chunks = chunk_documents(docs, chunk_size=400, overlap=50)
    emb = embed_texts(chunks, RandomProjectionEncoder(384), 384)
    root = tempfile.mkdtemp(prefix="corpus-store-")
    cat = VectorStoreCatalog(spark, root)
    store = cat.create_store("corpus", "rp384", dimension=384)
    store.add_vectors(
        emb.select(
            F.col("embedding"),
            F.map_from_arrays(
                F.array(F.lit("document_id"), F.lit("chunk_index")),
                F.array(
                    F.col("document_id").cast("string"),
                    F.col("chunk_index").cast("string"),
                ),
            ).alias("meta"),
        )
    )
    n6 = store.count()

    print(f"documents             : {n0}")
    print(f"after exact dedup     : {n1}")
    print(f"after near-dup removal: {n2}")
    print(f"after decontamination : {n3} (train split only)")
    print(f"after quality gates   : {n4}")
    print(f"after mixing quotas   : {n5}")
    print(f"chunks embedded+stored: {n6}")
    assert n0 >= n1 >= n2 >= n3 >= n4 >= n5 and n6 > 0
    print("corpus pipeline OK")


if __name__ == "__main__":
    main()
