"""k-means clustering: separation on blobs, exact inertia, determinism."""

from __future__ import annotations

import numpy as np
import pytest

from mlx_vector_db_spark.operators.clustering import cluster_stats, kmeans_fit


def _blobs(spark, centers, per=30, scale=0.05, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    i = 0
    for c in centers:
        for _ in range(per):
            v = (np.asarray(c) + rng.normal(0, scale, len(c))).tolist()
            rows.append((i, [float(x) for x in v]))
            i += 1
    return spark.createDataFrame(rows, "id long, embedding array<float>")


CENTERS = [[0.0, 0.0, 5.0], [5.0, 0.0, 0.0], [0.0, 5.0, 0.0]]


def test_blobs_recovered(spark):
    df = _blobs(spark, CENTERS)
    model = kmeans_fit(df, k=3, seed=1)
    assigned = model.assign(df)
    rows = assigned.collect()
    # each ground-truth blob (ids 0-29, 30-59, 60-89) maps to exactly
    # one distinct cluster id
    by_blob = {}
    for r in rows:
        by_blob.setdefault(r.id // 30, set()).add(r.cluster_id)
    assert all(len(s) == 1 for s in by_blob.values())
    assert len({next(iter(s)) for s in by_blob.values()}) == 3


def test_sq_dist_matches_numpy(spark):
    df = _blobs(spark, CENTERS, per=5)
    model = kmeans_fit(df, k=3, seed=1)
    got = {r.id: (r.cluster_id, r.sq_dist) for r in model.assign(df).collect()}
    vecs = {r.id: np.asarray(r.embedding, dtype=np.float64)
            for r in df.collect()}
    for i, (cid, sd) in got.items():
        d2 = ((model.centroids - vecs[i]) ** 2).sum(axis=1)
        assert cid == int(d2.argmin())
        assert sd == pytest.approx(float(d2[cid]), rel=1e-6)


def test_cluster_stats_and_inertia_improves(spark):
    df = _blobs(spark, CENTERS)
    m3 = kmeans_fit(df, k=3, seed=1)
    m1 = kmeans_fit(df, k=1, seed=1)
    s3 = cluster_stats(m3.assign(df)).collect()
    s1 = cluster_stats(m1.assign(df)).collect()
    assert sum(r.n_points for r in s3) == 90
    assert len(s3) == 3 and len(s1) == 1
    assert sum(r.inertia for r in s3) < sum(r.inertia for r in s1)


def test_deterministic_for_seed(spark):
    df = _blobs(spark, CENTERS)
    a = kmeans_fit(df, k=3, seed=7).centroids
    b = kmeans_fit(df, k=3, seed=7).centroids
    assert np.array_equal(a, b)


def test_roundtrip_dict(spark):
    df = _blobs(spark, CENTERS, per=5)
    model = kmeans_fit(df, k=2, seed=3)
    from mlx_vector_db_spark.operators.clustering import KMeansModel

    clone = KMeansModel.from_dict(model.to_dict())
    assert np.array_equal(clone.centroids, model.centroids)
    got_a = {(r.id, r.cluster_id) for r in model.assign(df, dist_col=None).collect()}
    got_b = {(r.id, r.cluster_id) for r in clone.assign(df, dist_col=None).collect()}
    assert got_a == got_b


def test_k_validated(spark):
    df = _blobs(spark, CENTERS, per=2)
    with pytest.raises(ValueError):
        kmeans_fit(df, k=0)


def test_assign_arrow_matches_expr_exactly(spark):
    import numpy as np

    from mlx_vector_db_spark.operators.clustering import kmeans_fit

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(500)]
    # plant exact duplicates so the tie-break rule is actually exercised
    rows += [(1000 + i, rows[i][1]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    model = kmeans_fit(df, k=150, seed=2)  # auto method picks arrow at k>=128
    expr = {
        (r.vec_id, r.cluster_id, round(r.sq_dist, 9))
        for r in model.assign(df, method="expr").collect()
    }
    arrow = {
        (r.vec_id, r.cluster_id, round(r.sq_dist, 9))
        for r in model.assign(df, method="arrow").collect()
    }
    auto = {
        (r.vec_id, r.cluster_id, round(r.sq_dist, 9))
        for r in model.assign(df).collect()
    }
    assert expr == arrow == auto
    import pytest as _pytest

    with _pytest.raises(ValueError):
        model.assign(df, method="bogus")
