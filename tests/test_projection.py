"""Unit tests for JL random projection; the distance-preservation gate
on real testdata is `jl_projection_gate` in the catalog sweep."""

from __future__ import annotations

import numpy as np
import pytest

from mlx_vector_db_spark.operators.projection import JLProjection, project_vectors


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=64)]) for i in range(300)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_matches_numpy_exactly(spark, emb):
    proj = JLProjection(64, 16, seed=9)
    got = {
        r.vec_id: np.array(r.projected)
        for r in project_vectors(emb, proj).collect()
    }
    R = proj.matrix
    for r in emb.collect():
        want = (np.array(r.embedding, dtype=np.float64) @ R).astype(np.float32)
        assert np.array_equal(got[r.vec_id], want), r.vec_id


def test_jl_distance_preservation(spark, emb):
    # m=32: squared-distance ratios concentrate around 1
    out = project_vectors(emb, JLProjection(64, 32, seed=1)).collect()
    X = np.vstack([r.embedding for r in out]).astype(np.float64)
    Y = np.vstack([r.projected for r in out]).astype(np.float64)
    rng = np.random.default_rng(0)
    i, j = rng.integers(0, len(X), 500), rng.integers(0, len(X), 500)
    keep = i != j
    d0 = ((X[i[keep]] - X[j[keep]]) ** 2).sum(1)
    d1 = ((Y[i[keep]] - Y[j[keep]]) ** 2).sum(1)
    ratio = d1 / d0
    assert 0.9 <= ratio.mean() <= 1.1
    assert (np.abs(ratio - 1) <= 0.6).mean() >= 0.95


def test_composes_with_kmeans_and_roundtrip(spark, emb):
    from mlx_vector_db_spark.operators.clustering import kmeans_fit

    proj = JLProjection.from_dict(JLProjection(64, 8, seed=3).to_dict())
    p = project_vectors(emb, proj)
    model = kmeans_fit(p, k=4, vec_col="projected", seed=1)
    assigned = model.assign(p, dist_col=None)
    assert assigned.where("cluster_id between 0 and 3").count() == 300


def test_validation(spark, emb):
    with pytest.raises(ValueError, match="reduce"):
        JLProjection(16, 32)
    with pytest.raises(ValueError, match="dims"):
        JLProjection(0, 0)
    bad = JLProjection(32, 8)  # wrong in_dim for a 64-dim column
    with pytest.raises(Exception, match="dim"):
        project_vectors(emb, bad).collect()
