from mlx_vector_db_spark.operators.knn import knn_join, knn_query
from mlx_vector_db_spark.operators.topk import top_k_per_group

__all__ = ["knn_join", "knn_query", "top_k_per_group"]
