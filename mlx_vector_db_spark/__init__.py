"""mlx_vector_db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Theseus-AT/mlx-vector-db.

The reference is a single-node MLX (Apple-Silicon) vector database: dense
float32 embedding matrices + JSON metadata, brute-force / HNSW k-NN with
conjunctive equality metadata filters, an embedding/RAG text pipeline, and
batch ingestion (see SURVEY.md at the repo root for the full inventory).

This package re-expresses that surface Spark-first:

- Data lives in partitioned Parquet tables (``store.VectorStore``), one
  logical store per ``(user_id, model_id)``; "index" is extra columns
  (LSH bucket / IVF centroid id) enabling partition pruning, not a
  side-car binary file.
- Similarity search is a declarative DataFrame plan: broadcast the query
  side, score with JVM column expressions (or an Arrow-batched Pandas UDF
  block-matmul for wide batches), per-query top-k via window rank
  (Spark's WindowGroupLimit pushdown keeps it O(k) per partition).
- The text/RAG pipeline, dedup suite (exact / MinHash-LSH / SimHash /
  embedding cosine), text analysis, and streaming ingest are first-class
  operators built on DataFrame / Structured Streaming primitives.

Everything here derives from public knowledge only: the Apache Spark API
and the reference repo's observable behavior.
"""

from mlx_vector_db_spark.session import get_spark, release_intermediates

__all__ = ["get_spark", "release_intermediates"]
__version__ = "0.1.0"
