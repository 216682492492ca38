"""Unit tests for SemDeDup; the end-to-end planted-fixture gate on real
testdata is `semdedup_gate` in the catalog sweep."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.clustering import kmeans_fit
from mlx_vector_db_spark.operators.semdedup import semdedup, semdedup_pairs

DIM = 8


def _mk_corpus(spark, n_per=40, n_centers=3, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, DIM)) * 10.0
    rows = []
    vid = 0
    for c in centers:
        for _ in range(n_per):
            v = c + rng.normal(size=DIM) * 2.0
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def corpus(spark):
    return _mk_corpus(spark).localCheckpoint()


def test_planted_exact_dups_resolve(spark, corpus):
    n = corpus.count()
    planted = corpus.limit(10).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    full = corpus.unionByName(planted)
    model = kmeans_fit(full, k=6, seed=1)
    surv = semdedup(full, threshold=0.9999, model=model, max_cluster_size=None)
    surv_ids = {r.vec_id for r in surv.select("vec_id").collect()}
    # min_id keeper: the original survives, the planted copy never does
    for orig in range(10):
        assert orig in surv_ids
        assert orig + 10_000 not in surv_ids
    assert len(surv_ids) == n  # exactly the 10 copies removed


def test_no_surviving_within_cluster_pair(spark, corpus):
    model = kmeans_fit(corpus, k=6, seed=1)
    surv = semdedup(corpus, threshold=0.99, model=model, max_cluster_size=None)
    left = semdedup_pairs(surv, threshold=0.99, model=model, max_cluster_size=None)
    assert left.count() == 0


def test_far_centroid_keeper(spark):
    # one tight dup group far from a second cluster; the group's member
    # FARTHEST from its centroid must be the survivor under the paper's
    # keeper, while min_id keeps the smallest id
    base = np.ones(DIM)
    rows = [
        (0, [float(x) for x in base * 10.0]),
        (1, [float(x) for x in base * 10.0]),  # exact dup of 0
        (2, [float(x) for x in base * 10.6]),  # same direction, farther out
        (3, [float(-x) for x in base * 10.0]),  # opposite cluster
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    model = kmeans_fit(df, k=2, seed=3)
    far = semdedup(
        df, threshold=0.999, model=model, keep="far_centroid",
        max_cluster_size=None,
    )
    far_ids = {r.vec_id for r in far.collect()}
    near = semdedup(
        df, threshold=0.999, model=model, keep="min_id", max_cluster_size=None
    )
    near_ids = {r.vec_id for r in near.collect()}
    assert 3 in far_ids and 3 in near_ids  # other cluster untouched
    assert near_ids == {0, 2, 3} or near_ids == {0, 3}
    # the survivor of the {0,1,2}-side component is its farthest member
    group = {0, 1, 2} & far_ids
    assert len(group) >= 1
    # 0 and 1 are identical: whichever survives, 1 (the higher dup id)
    # never outlives 0 under far_centroid's id tie-break
    assert not ({1} <= far_ids and 0 not in far_ids)


def test_max_cluster_size_cap_excludes_hot_cluster(spark, corpus):
    # collapse every vector of one cluster onto a single point: with an
    # int cap below the cluster size, that cluster is excluded -> its
    # rows all survive and a warning names the fix
    hot = spark.createDataFrame(
        [(9_000 + i, [1.0] * DIM) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    full = corpus.unionByName(hot)
    model = kmeans_fit(full, k=4, seed=5)
    with pytest.warns(UserWarning, match="excluded from pair search"):
        surv = semdedup(
            full, threshold=0.999, model=model, max_cluster_size=20
        )
    surv_ids = {r.vec_id for r in surv.collect()}
    assert all(9_000 + i in surv_ids for i in range(30))
    # audit form dedups them down to one
    surv2 = semdedup(full, threshold=0.999, model=model, max_cluster_size=None)
    assert surv2.where(F.col("vec_id") >= 9_000).count() == 1


def test_validation(spark, corpus):
    with pytest.raises(ValueError):
        semdedup(corpus, threshold=0.0)
    with pytest.raises(ValueError):
        semdedup(corpus, keep="other")
    with pytest.raises(ValueError):
        semdedup_pairs(corpus, max_cluster_size=1)
    with pytest.raises(ValueError):
        semdedup_pairs(corpus, max_cluster_size="bogus")


def test_pair_method_parity_arrow_vs_expr(spark, corpus):
    # the BLAS gram-matrix path and the relational audit tier must
    # produce the same pair set with the same cosines
    model = kmeans_fit(corpus, k=6, seed=1)
    kw = dict(threshold=0.9, model=model, max_cluster_size=None)
    pe = {
        (r.id_a, r.id_b, round(r.cosine, 9))
        for r in semdedup_pairs(corpus, pair_method="expr", **kw).collect()
    }
    pa_ = {
        (r.id_a, r.id_b, round(r.cosine, 9))
        for r in semdedup_pairs(corpus, pair_method="arrow", **kw).collect()
    }
    assert pe == pa_ and len(pe) > 0
    with pytest.raises(ValueError):
        semdedup_pairs(corpus, pair_method="bogus", model=model)
