"""Bulk ingestion sources (reference S3-S6, api/routes/batch_v1.py:399-441).

The reference's bulk upload accepts npz / jsonl (csv is declared in the
request model but never implemented — batch_v1.py:73); all parsing
happens in one Python process. Here each format becomes a distributed
reader producing the canonical ``id, embedding array<float>, meta``
shape that VectorStore.add_vectors accepts:

- jsonl: ``spark.read.json`` with an explicit schema (splittable,
  scales to any size);
- csv: ``spark.read.csv`` + a split/cast projection (splittable);
- npz: numpy's format is a zip of whole arrays — not splittable — so it
  is read driver-side and parallelized immediately; documented as the
  small-file compatibility path, with parquet/jsonl as the scale paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("vector", T.ArrayType(T.FloatType())),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)


def read_vectors_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Lines of ``{"vector": [...], "metadata": {...}}`` (reference S4,
    batch_v1.py:413-423). FAILFAST raises on malformed or
    type-mismatched records as soon as rows are materialized (note: a
    bare ``count()`` skips JSON parsing entirely and won't trip it);
    :func:`validate_vectors_df` additionally enforces dimension and
    finiteness — always run it before ingesting."""
    df = spark.read.schema(_JSONL_SCHEMA).option("mode", "FAILFAST").json(path)
    return df.select(
        F.monotonically_increasing_id().alias("id"),
        F.col("vector").alias("embedding"),
        F.coalesce(
            F.col("metadata"), F.create_map().cast("map<string,string>")
        ).alias("meta"),
    )


def read_vectors_csv(
    spark: SparkSession, path: str, delimiter: str = ",", vector_sep: str = ";"
) -> DataFrame:
    """CSV with a ``vector`` column of ``;``-joined floats plus arbitrary
    metadata columns (reference S5 declared this format but never
    implemented it — batch_v1.py:73)."""
    raw = spark.read.option("header", True).option("delimiter", delimiter).csv(path)
    if "vector" not in raw.columns:
        raise ValueError(f"csv at {path} has no 'vector' column: {raw.columns}")
    meta_cols = [c for c in raw.columns if c != "vector"]
    meta = (
        F.map_from_arrays(
            F.array(*[F.lit(c) for c in meta_cols]),
            F.array(*[F.col(c).cast("string") for c in meta_cols]),
        )
        if meta_cols
        else F.create_map().cast("map<string,string>")
    )
    return raw.select(
        F.monotonically_increasing_id().alias("id"),
        F.transform(
            F.split(F.col("vector"), vector_sep), lambda x: x.cast("float")
        ).alias("embedding"),
        meta.alias("meta"),
    )


def read_vectors_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC variant of the canonical vector source (beyond the reference
    — it has no columnar bulk format at all). ORC is Spark-native
    (splittable, predicate-pushdown-capable like parquet), so this is a
    plain scan plus the same shape normalization the other readers do.
    Expects columns ``embedding array<float>`` (or castable) and
    optionally ``id`` / ``meta``; missing ids are synthesized, missing
    meta becomes an empty map."""
    df = spark.read.orc(path)
    if "embedding" not in df.columns:
        raise ValueError(f"orc at {path} has no 'embedding' column: {df.columns}")
    id_col = (
        F.col("id").cast("long")
        if "id" in df.columns
        else F.monotonically_increasing_id()
    )
    meta = (
        F.col("meta")
        if "meta" in df.columns
        else F.create_map().cast("map<string,string>")
    )
    return df.select(
        id_col.alias("id"),
        F.col("embedding").cast("array<float>").alias("embedding"),
        meta.alias("meta"),
    )


def read_vectors_npz(
    spark: SparkSession, path: str, array_name: str = "vectors"
) -> DataFrame:
    """Reference S3 (batch_v1.py:408-411): parse ``.npz``, synthesize
    ``{'id': 'bulk_{i}'}`` metadata. npz is a whole-file format —
    driver-side read, then parallelize; for real scale convert to
    parquet upstream."""
    import numpy as np

    with np.load(path) as npz:
        if array_name not in npz:
            raise ValueError(
                f"npz at {path} has no array {array_name!r}; found {list(npz)}"
            )
        mat = np.asarray(npz[array_name], dtype=np.float32)
    if mat.ndim != 2:
        raise ValueError(f"expected 2-D array, got shape {mat.shape}")
    rows = [
        (i, mat[i].tolist(), {"id": f"bulk_{i}"}) for i in range(mat.shape[0])
    ]
    return spark.createDataFrame(
        rows, "id long, embedding array<float>, meta map<string,string>"
    )


def validate_vectors_df(df: DataFrame, dimension: int) -> None:
    """Shape/length validation (reference P5, utils.py:27-41,
    service/models.py:41-46) as plan-level checks: every embedding
    non-null with the declared dimension and no NaN/Inf values."""
    bad_dim = df.where(
        F.col("embedding").isNull()
        | (F.size("embedding") != F.lit(int(dimension)))
    ).limit(1)
    if bad_dim.count():
        raise ValueError(f"embedding rows with dimension != {dimension}")
    non_finite = df.where(
        F.exists("embedding", lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == float("inf")))
    ).limit(1)
    if non_finite.count():
        raise ValueError("embedding rows with null/NaN/Inf components")
