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
    stage 5  DSIR selection         (importance weights vs the English
                                     slice; deterministic Gumbel-top-k)
    stage 6  mixing                 (token-budget mixture planner)
    stage 7  leakage-safe split     (train/val assigned per near-dup
                                     component, never per document)
    stage 8  chunk + embed + store  (pandas-UDF chunker, 384-dim
                                     encoder, partitioned parquet store)
    stage 9  dq audit               (constraint report over the store)

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

    # 5. DSIR: keep the documents most like the English target slice
    from mlx_vector_db_spark.operators.dsir import dsir_resample

    target = docs.where(F.col("lang") == "en")
    picked = dsir_resample(docs, target, n=max(50, n4 // 2), n_buckets=4096)
    docs = docs.join(picked.select("doc_id"), "doc_id", "left_semi")
    n5 = docs.count()

    # 6. token-budget mixing: per-source char budgets, shortfalls visible
    from mlx_vector_db_spark.operators.sampling import plan_mixture

    targets = {f"src{i}": 50_000.0 for i in range(1, 21)}
    plan, docs = plan_mixture(docs, targets, stratum_col="source",
                              weight_col="n_chars")
    n6 = docs.count()

    # 7. leakage-safe split: near-dup components are the atomic units
    from mlx_vector_db_spark.operators.components import component_safe_split

    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    fps = docs.select("doc_id", F.md5(F.substring(norm, 1, 80)).alias("fp"))
    dup_fps = fps.groupBy("fp").agg(F.count("*").alias("n")).where("n > 1")
    members = fps.join(dup_fps.select("fp"), "fp")
    pairs = (
        members.alias("a").join(members.alias("b"), "fp")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    docs = component_safe_split(docs, pairs, {"train": 0.95, "val": 0.05})
    n7 = docs.where("split = 'train'").count()
    docs = docs.where("split = 'train'").drop("split", "component")

    # 8. chunk -> embed -> store
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
    n8 = store.count()

    # 9. dq audit over the landed store: every constraint one report
    from mlx_vector_db_spark.operators.dq import Check, dq_audit

    report = dq_audit(
        store.to_df(),
        Check(completeness=["id", "embedding"], uniqueness=["id"]),
    )
    n_failed = report.where("NOT passed").count()

    print(f"documents             : {n0}")
    print(f"after exact dedup     : {n1}")
    print(f"after near-dup removal: {n2}")
    print(f"after decontamination : {n3} (train split only)")
    print(f"after quality gates   : {n4}")
    print(f"after DSIR selection  : {n5}")
    print(f"after mixture budget  : {n6}")
    print(f"train split (95%)     : {n7}")
    print(f"chunks embedded+stored: {n8}")
    print(f"dq constraints failed : {n_failed}")
    assert n0 >= n1 >= n2 >= n3 >= n4 >= n5 >= n6 >= n7 and n8 > 0
    assert n_failed == 0
    print("corpus pipeline OK")


if __name__ == "__main__":
    main()
