#!/usr/bin/env python
"""Runnable tour of the engine — the rebuild's analog of the reference's
tests/demo.py scenarios (filters incl. conjunctive + empty-result,
batch query, store lifecycle, index), plus the pipeline extensions.

    python examples/demo.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from mlx_vector_db_spark import get_spark
    from mlx_vector_db_spark.client import VectorDBClient
    from mlx_vector_db_spark.operators.dedup import minhash_lsh_pairs
    from mlx_vector_db_spark.pipeline import HashingEncoder, TextPipeline
    from mlx_vector_db_spark.store import VectorStoreCatalog

    spark = get_spark("demo")
    rng = np.random.default_rng(0)
    root = tempfile.mkdtemp(prefix="demo-stores-")

    print("=== 1. store lifecycle + filtered kNN (reference demo.py:196-260) ===")
    cat = VectorStoreCatalog(spark, root)
    store = cat.create_store(
        "demo", "model", dimension=128,
        promoted_keys={"category": "string", "priority": "int", "lang": "string"},
    )
    vecs = rng.random((20, 128)).astype(np.float32)
    meta = [
        {"category": "A" if i % 2 == 0 else "B", "priority": i % 3,
         "lang": "de" if i % 4 == 0 else "en"}
        for i in range(20)
    ]
    store.add_vectors(vecs.tolist(), meta)
    q = vecs[4].tolist()
    print("plain top-3:")
    store.query(q, k=3).select("id", "category", "priority", "similarity", "rank").show()
    print("conjunctive filter {category: A, priority: 1}:")
    store.query(q, k=3, filter_metadata={"category": "A", "priority": 1}) \
         .select("id", "category", "priority", "rank").show()
    print("no-match filter -> empty, not an error:",
          store.query(q, k=3, filter_metadata={"category": "C"}).count(), "rows")

    print("=== 2. batch query + IVF index ===")
    store.build_index(nlist=4)
    qdf = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(3)],
        "query_id long, embedding array<float>",
    )
    store.batch_query(qdf, k=2).orderBy("query_id", "rank").show()
    print("stats:", store.stats())

    print("=== 3. SDK-compatible client ===")
    client = VectorDBClient(spark, root + "-client", default_dimension=16)
    client.create_store("tenant", "m")
    client.add_vectors("tenant", "m", rng.random((5, 16)).tolist(),
                       [{"tag": str(i)} for i in range(5)])
    resp = client.query("tenant", "m", rng.random(16).tolist(), k=2)
    print("client results:", [(r.id, round(r.similarity_score, 3)) for r in resp.results])

    print("=== 4. text pipeline: index real documents + RAG ===")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    rag_store = cat.create_store(
        "demo", "rag", dimension=64,
        promoted_keys={"document_id": "long", "chunk_index": "int",
                       "chunk_text": "string", "chunk_length": "int",
                       "document_source": "string"},
    )
    pipe = TextPipeline(rag_store, HashingEncoder(64))
    n = pipe.index_documents(docs)
    print(f"indexed {n} chunks from 100 documents")
    target = docs.first()
    print(pipe.answer_prompt(target["text"][:60], k=2, min_similarity=0.0)[:300], "...")

    print("=== 5. near-duplicate detection on the real corpus ===")
    pairs = minhash_lsh_pairs(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        threshold=0.5,
    )
    pairs.orderBy("id_a").show(5)


if __name__ == "__main__":
    main()
