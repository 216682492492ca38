from mlx_vector_db_spark.operators.knn import (
    knn_join,
    knn_join_blocked,
    knn_join_chunked,
    knn_query,
)
from mlx_vector_db_spark.operators.topk import top_k_per_group

__all__ = [
    "knn_join",
    "knn_join_blocked",
    "knn_join_chunked",
    "knn_query",
    "top_k_per_group",
]
