"""Product quantization: codebook training, Arrow encode, ADC search
with exact re-rank vs the exact kNN oracle, residual (IVF-PQ) variant.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.knn import knn_join
from mlx_vector_db_spark.operators.pq import PQCodebooks, pq_search_batch, train_pq

N, DIM, K = 2000, 16, 10
RNG = np.random.default_rng(23)


@pytest.fixture(scope="module")
def vec_np():
    centers = RNG.random((8, DIM)) * 4
    assign = RNG.integers(0, 8, N)
    return (centers[assign] + 0.3 * RNG.standard_normal((N, DIM))).astype(np.float32)


@pytest.fixture(scope="module")
def vectors(spark, vec_np):
    return spark.createDataFrame(
        [(i, vec_np[i].tolist()) for i in range(N)],
        "id long, embedding array<float>",
    ).cache()


@pytest.fixture(scope="module")
def pq(vectors):
    return train_pq(vectors, m=4, nbits=8, seed=5)


@pytest.fixture(scope="module")
def coded(vectors, pq):
    return pq.encode(vectors).cache()


def test_codes_shape_and_compression(coded, pq):
    assert pq.compression == (DIM * 4) / 4  # 16x at m=4, dim=16
    row = coded.first()
    assert isinstance(row["pq_code"], (bytes, bytearray)) and len(row["pq_code"]) == 4
    assert coded.count() == N


def test_reconstruction_error_bounded(pq, vec_np):
    """PQ reconstruction error must be far below the data's own spread —
    the codebooks actually learned the subspace structure."""
    X = vec_np[:500].astype(np.float64)
    mse = pq.search_errors(X).mean()
    var = X.var(axis=0).mean()
    assert mse < 0.25 * var


def test_serialization_roundtrip(pq, vec_np):
    clone = PQCodebooks.from_dict(pq.to_dict())
    X = vec_np[:64].astype(np.float64)
    assert np.array_equal(clone._assign(X), pq._assign(X))


@pytest.mark.parametrize("metric", ["cosine", "dot_product", "euclidean"])
def test_pq_search_matches_exact_after_rerank(spark, vectors, coded, pq, vec_np, metric):
    """ADC first pass + exact re-rank: recall@10 >= 0.9 vs the exact
    batch kNN, and every returned score is the EXACT score (the re-rank
    re-scores floats, so PQ error can only cost recall, never wrong
    values)."""
    qn = 10
    queries = spark.createDataFrame(
        [(i, vec_np[i].tolist()) for i in range(qn)],
        "query_id long, embedding array<float>",
    )
    approx = pq_search_batch(coded, queries, pq, k=K, metric=metric, overfetch=4)
    exact = knn_join(vectors, queries, k=K, metric=metric)
    a = {(r["query_id"], r["id"]): r["score"] for r in approx.collect()}
    e = {(r["query_id"], r["id"]): r["score"] for r in exact.collect()}
    recall = len(a.keys() & e.keys()) / len(e)
    assert recall >= 0.9, f"{metric}: recall {recall}"
    for key in a.keys() & e.keys():
        assert a[key] == pytest.approx(e[key], abs=1e-9), metric


def test_pq_first_pass_prunes_float_column(spark, coded, pq, vec_np):
    """The ADC scan must read only (id, pq_code) — the float embedding
    column stays OUT of the candidate-generation scan (the 16-64x IO
    claim the module is built on)."""
    queries = spark.createDataFrame(
        [(0, vec_np[0].tolist())], "query_id long, embedding array<float>"
    )
    out = pq_search_batch(coded, queries, pq, k=K, exact_rerank=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        l for l in plan.splitlines() if "Scan" in l and "pq_code" in l
    ]
    assert scan_lines, "no code-column scan found in the plan"
    assert all("embedding" not in l for l in scan_lines), scan_lines
    # and exactly ONE ADC kernel in the exact_rerank=False plan: the
    # candidate stage must not execute the ADC scan twice (the other
    # MapInPandas in this fixture's plan is the upstream encode stage)
    assert len([l for l in plan.splitlines() if "MapInPandas adc" in l]) == 1


def test_residual_pq_beats_plain_pq(spark, vectors, vec_np):
    """IVF-PQ: quantizing residuals v - centroid(v) with the same
    codebook budget reconstructs strictly better on clustered data."""
    from mlx_vector_db_spark.operators.ann import build_ivf

    indexed, ivf = build_ivf(vectors, nlist=8, seed=3)
    plain = train_pq(vectors, m=4, nbits=6, seed=5)
    resid = train_pq(
        indexed, m=4, nbits=6, seed=5, centroids=ivf.centroids
    )
    X = vec_np[:500].astype(np.float64)
    cells = np.array(
        [r["centroid_id"] for r in indexed.where(F.col("id") < 500)
         .orderBy("id").select("centroid_id").collect()]
    )
    R = X - ivf.centroids[cells]
    assert resid.search_errors(R).mean() < plain.search_errors(X).mean()
    # residual encode path produces valid byte codes through Spark too
    coded = resid.encode(indexed, centroids=ivf.centroids)
    row = coded.where(F.col("id") == 7).first()
    assert len(row["pq_code"]) == 4


def test_pq_validation():
    with pytest.raises(ValueError, match="ksub"):
        PQCodebooks(np.zeros((2, 300, 4)))
    with pytest.raises(ValueError, match="books"):
        PQCodebooks(np.zeros((2, 4)))


@pytest.fixture(scope="module")
def ivfpq(spark, vectors):
    from mlx_vector_db_spark.operators.ann import build_ivf

    indexed, ivf = build_ivf(vectors, nlist=8, seed=3)
    indexed = indexed.cache()
    pq = train_pq(indexed, m=4, nbits=8, seed=5, centroids=ivf.centroids)
    coded = pq.encode(indexed, centroids=ivf.centroids).cache()
    return coded, pq, ivf


@pytest.mark.parametrize("metric", ["cosine", "dot_product", "euclidean"])
def test_ivfpq_search_recall_and_exact_scores(spark, vectors, ivfpq, vec_np, metric):
    """Residual IVF-PQ at nprobe=4/8 on clustered data: recall@10 >= 0.9
    vs exact, returned scores exactly the float scores (re-rank)."""
    from mlx_vector_db_spark.operators.pq import ivfpq_search_batch

    coded, pq, ivf = ivfpq
    qn = 10
    queries = spark.createDataFrame(
        [(i, vec_np[i].tolist()) for i in range(qn)],
        "query_id long, embedding array<float>",
    )
    approx = ivfpq_search_batch(
        coded, queries, pq, ivf.centroids, k=K, metric=metric,
        nprobe=4, overfetch=4,
    )
    exact = knn_join(vectors, queries, k=K, metric=metric)
    a = {(r["query_id"], r["id"]): r["score"] for r in approx.collect()}
    e = {(r["query_id"], r["id"]): r["score"] for r in exact.collect()}
    recall = len(a.keys() & e.keys()) / len(e)
    assert recall >= 0.9, f"{metric}: recall {recall}"
    for key in a.keys() & e.keys():
        assert a[key] == pytest.approx(e[key], abs=1e-9), metric


def test_ivfpq_full_probe_matches_plain_recall(spark, vectors, ivfpq, vec_np):
    """nprobe == nlist removes the pruning term: every exact top-10 id
    survives the over-fetched residual-ADC candidate set on this data."""
    from mlx_vector_db_spark.operators.pq import ivfpq_search_batch

    coded, pq, ivf = ivfpq
    queries = spark.createDataFrame(
        [(0, vec_np[0].tolist())], "query_id long, embedding array<float>"
    )
    approx = ivfpq_search_batch(
        coded, queries, pq, ivf.centroids, k=K, nprobe=8, overfetch=4
    )
    exact = knn_join(vectors, queries, k=K)
    assert {r["id"] for r in approx.collect()} == {r["id"] for r in exact.collect()}


def test_train_pq_driver_transfer_bounded(spark, monkeypatch):
    """The toPandas() training transfer is capped at max_train_rows BY
    CONSTRUCTION — even a mis-set sample fraction / stale count cannot
    pull a huge store to the driver."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from mlx_vector_db_spark.operators.pq import train_pq

    rng = np.random.default_rng(7)
    df = spark.createDataFrame(
        [(i, rng.random(16).astype(float).tolist()) for i in range(300)],
        "id long, embedding array<double>",
    )
    sizes = []
    orig = CDF.toPandas

    def spy(self):
        out = orig(self)
        sizes.append(len(out))
        return out

    orig_ta = CDF.toArrow

    def spy_ta(self):
        out = orig_ta(self)
        sizes.append(out.num_rows)
        return out

    monkeypatch.setattr(CDF, "toPandas", spy)
    monkeypatch.setattr(CDF, "toArrow", spy_ta)
    pq = train_pq(df, m=4, nbits=2, max_train_rows=64)
    assert sizes and max(sizes) <= 64
    assert pq.books.shape[0] == 4
    with pytest.raises(ValueError, match="max_train_rows"):
        train_pq(df, m=4, nbits=2, max_train_rows=0)


def test_build_ivf_driver_transfer_bounded(spark, monkeypatch):
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from mlx_vector_db_spark.operators.ann import build_ivf

    rng = np.random.default_rng(8)
    df = spark.createDataFrame(
        [(i, rng.random(8).astype(float).tolist()) for i in range(400)],
        "id long, embedding array<double>",
    )
    sizes = []
    orig = CDF.toPandas

    def spy(self):
        out = orig(self)
        sizes.append(len(out))
        return out

    orig_ta = CDF.toArrow

    def spy_ta(self):
        out = orig_ta(self)
        sizes.append(out.num_rows)
        return out

    monkeypatch.setattr(CDF, "toPandas", spy)
    monkeypatch.setattr(CDF, "toArrow", spy_ta)
    # adversarial: full-table sample_fraction — the cap must still hold
    indexed, index = build_ivf(
        df, nlist=4, sample_fraction=1.0, max_train_rows=50, seed=3
    )
    assert sizes and max(sizes) <= 50
    assert indexed.select("centroid_id").distinct().count() <= 4
    with pytest.raises(ValueError, match="max_train_rows"):
        build_ivf(df, nlist=4, max_train_rows=0)


def test_tune_overfetch_picks_smallest_sufficient(spark, vectors, coded, pq):
    """The tuner returns the smallest ladder rung whose measured
    recall@k meets the target, the curve is monotone non-decreasing
    over tried rungs, and the chosen rung's recall is reproducible via
    a direct search at that overfetch."""
    from mlx_vector_db_spark.operators.pq import tune_overfetch

    queries = vectors.where(F.col("id") < 16).select(
        F.col("id").alias("query_id"), "embedding"
    )
    chosen, curve = tune_overfetch(
        coded, queries, pq, k=K, target_recall=0.9
    )
    assert chosen in curve and curve[chosen] >= 0.9
    tried = sorted(curve)
    assert all(curve[a] <= curve[b] + 1e-9 for a, b in zip(tried, tried[1:]))
    # every rung below the chosen one failed the target (minimality)
    assert all(curve[c] < 0.9 for c in tried if c < chosen)
    # direct search at the chosen overfetch reproduces the recall
    exact = knn_join(vectors, queries, k=K).select("query_id", "id")
    approx = pq_search_batch(
        coded, queries, pq, k=K, overfetch=chosen, delegate_saturation=None
    ).select("query_id", "id")
    n = exact.count()
    got = approx.join(exact, on=["query_id", "id"]).count() / n
    assert got == pytest.approx(curve[chosen], abs=1e-9)


def test_tune_overfetch_residual_saturates_at_nprobe_ceiling(spark, vectors, ivfpq):
    """Residual IVF-PQ at a tiny nprobe: recall is capped by cell
    pruning, so the curve saturates below a 0.99 target and the tuner
    honestly returns the largest tried rung instead of pretending."""
    from mlx_vector_db_spark.operators.pq import tune_overfetch

    coded_r, pq_r, ivf = ivfpq
    queries = vectors.where(F.col("id") < 16).select(
        F.col("id").alias("query_id"), "embedding"
    )
    chosen, curve = tune_overfetch(
        coded_r, queries, pq_r, k=K, target_recall=0.99,
        candidates=[1, 2, 4], centroids=ivf.centroids, nprobe=1,
    )
    if max(curve.values()) < 0.99:
        assert chosen == 4  # largest tried — saturation, not success
    full_chosen, full_curve = tune_overfetch(
        coded_r, queries, pq_r, k=K, target_recall=0.9,
        candidates=[1, 2, 4, 8], centroids=ivf.centroids,
        nprobe=ivf.nlist,
    )
    assert full_curve[full_chosen] >= 0.9  # full probe removes the ceiling


def test_tune_overfetch_rejects_bad_params(spark, vectors, coded, pq):
    from mlx_vector_db_spark.operators.pq import tune_overfetch

    queries = vectors.where(F.col("id") < 4).select(
        F.col("id").alias("query_id"), "embedding"
    )
    with pytest.raises(ValueError):
        tune_overfetch(coded, queries, pq, target_recall=0.0)
    with pytest.raises(ValueError):
        tune_overfetch(
            coded, queries.where(F.col("query_id") < 0), pq
        )


def test_pq_null_query_parity(spark, coded, pq, vec_np):
    """r11 engine-wide NULL-rule probe: pq_search_batch excludes a NULL
    query vector (or NULL element) exactly as every kNN strategy does —
    the r9/r10 inhomogeneous-shape crash class, found on this operator
    by the same probe that found bq's."""
    from mlx_vector_db_spark.operators.pq import pq_search_batch

    rows = [
        (0, vec_np[0].tolist()),
        (1, None),
        (2, vec_np[2].tolist()),
        (3, [None if j == 3 else float(vec_np[3][j])
             for j in range(vec_np.shape[1])]),
    ]
    nullq = spark.createDataFrame(rows, "query_id long, embedding array<float>")
    out = pq_search_batch(coded, nullq, pq, k=5, overfetch=4)
    assert {r["query_id"] for r in out.collect()} == {0, 2}
    allnull = spark.createDataFrame(
        [(0, None)], "query_id long, embedding array<float>"
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="empty query"):
        pq_search_batch(coded, allnull, pq, k=5)


def test_ivfpq_null_query_parity(spark, vectors, vec_np):
    """Same probe for the fused IVF-PQ kernel and IVFIndex.search_batch."""
    from mlx_vector_db_spark.operators.ann import build_ivf
    from mlx_vector_db_spark.operators.pq import ivfpq_search_batch, train_pq

    indexed, ivf = build_ivf(vectors, nlist=4, seed=3, max_iter=5)
    pq2 = train_pq(indexed, m=4, nbits=4, seed=1, centroids=ivf.centroids)
    coded2 = pq2.encode(indexed)
    nullq = spark.createDataFrame(
        [(0, vec_np[0].tolist()), (1, None), (2, vec_np[2].tolist())],
        "query_id long, embedding array<float>",
    )
    out = ivfpq_search_batch(
        coded2, nullq, pq2, ivf.centroids, k=5, nprobe=4, overfetch=4
    )
    assert {r["query_id"] for r in out.collect()} == {0, 2}
    ivf_out = ivf.search_batch(indexed, nullq, k=5, nprobe=4)
    assert {r["query_id"] for r in ivf_out.collect()} == {0, 2}
    import pytest as _pt

    allnull = spark.createDataFrame(
        [(0, None)], "query_id long, embedding array<float>"
    )
    with _pt.raises(ValueError, match="empty query"):
        ivf.search_batch(indexed, allnull, k=5)


def test_pq_saturation_delegates_to_exact(spark, coded, pq, vec_np, vectors):
    """M*take >= 0.25*N: pq_search_batch IS knn_join — no semi-join in
    the plan, results bit-identical to the exact scan (the bq guard,
    applied symmetrically in r11)."""
    from mlx_vector_db_spark.operators.pq import pq_search_batch as psb

    queries = spark.createDataFrame(
        [(i, vec_np[i].tolist()) for i in range(20)],
        "query_id long, embedding array<float>",
    )
    out = psb(coded, queries, pq, k=K, overfetch=32)  # 20*320*4 >= 2000
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" not in plan
    exact = knn_join(vectors, queries, k=K)
    a = [(r["query_id"], r["id"], r["rank"])
         for r in out.orderBy("query_id", "rank").collect()]
    e = [(r["query_id"], r["id"], r["rank"])
         for r in exact.orderBy("query_id", "rank").collect()]
    assert a == e


def test_pq_unsaturated_keeps_two_pass(spark, coded, pq, vec_np):
    from mlx_vector_db_spark.operators.pq import pq_search_batch as psb

    one = spark.createDataFrame(
        [(0, vec_np[0].tolist())], "query_id long, embedding array<float>"
    )
    out = psb(coded, one, pq, k=K, overfetch=2)  # 1*20*4 << 2000
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
