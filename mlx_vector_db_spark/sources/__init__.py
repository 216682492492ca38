from mlx_vector_db_spark.sources.readers import (
    read_vectors_csv,
    read_vectors_orc,
    read_vectors_jsonl,
    read_vectors_npz,
    validate_vectors_df,
)

__all__ = [
    "read_vectors_csv",
    "read_vectors_orc",
    "read_vectors_jsonl",
    "read_vectors_npz",
    "validate_vectors_df",
]
