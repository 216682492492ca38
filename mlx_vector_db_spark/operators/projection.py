"""Random-projection dimensionality reduction for embedding columns.

Johnson-Lindenstrauss: a random linear map R^d -> R^m with entries
drawn N(0, 1/m) preserves pairwise distances within (1 ± eps) for
m = O(log n / eps^2), independent of d. At 100 TB the projection is
the standard pre-index step — a 384-dim corpus projected to 64 dims
cuts every downstream ANN cost (storage, probe bandwidth, BLAS flops)
by 6x while the recall gates quantify exactly what it paid.

Design:

- The matrix is DERIVED from a seed, never stored or shipped wide:
  every executor regenerates the same ``(d, m)`` Gaussian from
  ``np.random.default_rng(seed)`` — reproducible across engines,
  cluster sizes, and retries, like every other sampling decision in
  this repo.
- ``project_vectors`` is the documented Python-unavoidable Arrow path
  (one BLAS matmul per batch via ``mapInArrow``, the
  ``KMeansModel.assign`` pattern): a d x m literal-matrix JVM
  expression would pay the O(d*m) py4j construction cost and
  interpreted per-row evaluation that large-k clustering already
  measured and rejected.
- Composability: the output column is a plain ``array<float>``; IVF /
  PQ / kNN / SemDeDup run on it unchanged. ``JLProjection.to_dict``
  persists (seed, dims) — KBs of JSON, same convention as the IVF
  centroid block.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

__all__ = ["JLProjection", "project_vectors"]


class JLProjection:
    """Seed-derived Gaussian projection ``R^in_dim -> R^out_dim``."""

    def __init__(self, in_dim: int, out_dim: int, seed: int = 42):
        if out_dim < 1 or in_dim < 1:
            raise ValueError(f"dims must be >= 1 (got {in_dim} -> {out_dim})")
        if out_dim > in_dim:
            raise ValueError(
                f"out_dim {out_dim} > in_dim {in_dim}: projection must reduce"
            )
        self.in_dim = int(in_dim)
        self.out_dim = int(out_dim)
        self.seed = int(seed)

    @property
    def matrix(self) -> np.ndarray:
        """The (in_dim, out_dim) map, scaled 1/sqrt(out_dim) so expected
        norms are preserved. Regenerated on demand — never serialized."""
        rng = np.random.default_rng(self.seed)
        return rng.standard_normal((self.in_dim, self.out_dim)) / np.sqrt(
            self.out_dim
        )

    def to_dict(self) -> dict:
        return {
            "type": "jl",
            "in_dim": self.in_dim,
            "out_dim": self.out_dim,
            "seed": self.seed,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "JLProjection":
        return cls(d["in_dim"], d["out_dim"], d["seed"])


def project_vectors(
    df: DataFrame,
    projection: JLProjection,
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """``df`` + ``out_col`` = ``vec @ R`` as ``array<float>`` — map-only,
    one BLAS matmul per Arrow batch, zero shuffle."""
    import pyarrow as pa

    from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

    R = projection.matrix  # regenerated per task from the seed — ~KBs to MBs
    in_dim = projection.in_dim
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(FloatType()))]
    )

    def project_batches(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            col = rb.column(rb.schema.get_field_index(vec_col))
            if col.null_count:
                raise ValueError(f"NULL {vec_col!r} rows cannot be projected")
            flat = col.flatten().to_numpy(zero_copy_only=False)
            X = flat.astype(np.float64, copy=False).reshape(rb.num_rows, -1)
            if X.shape[1] != in_dim:
                raise ValueError(
                    f"{vec_col!r} has dim {X.shape[1]}, projection expects "
                    f"{in_dim}"
                )
            Y = (X @ R).astype(np.float32)
            out = pa.FixedSizeListArray.from_arrays(
                pa.array(Y.ravel()), Y.shape[1]
            ).cast(pa.list_(pa.float32()))
            yield pa.RecordBatch.from_arrays(
                list(rb.columns) + [out], names=list(rb.schema.names) + [out_col]
            )

    return df.mapInArrow(project_batches, schema)
