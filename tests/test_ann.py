"""ANN index-as-columns: IVF recall vs exact (mirrors the intent of the
reference's accuracy harness, tests/performance_demo_hnsw.py:96), LSH
bucketing, incremental assignment of new rows without rebuild.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.ann import (
    add_lsh_buckets,
    build_ivf,
    lsh_probe_buckets,
    make_planes,
)
from mlx_vector_db_spark.operators.knn import knn_join, knn_query

N, DIM, K = 2000, 16, 10
RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def vec_np():
    # clustered data (mixture of gaussians) — what IVF is for
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
def ivf(vectors):
    indexed, index = build_ivf(vectors, nlist=16, seed=1)
    return indexed.cache(), index


def test_ivf_assignment_matches_numpy(ivf, vec_np):
    indexed, index = ivf
    got = {r["id"]: r["centroid_id"] for r in indexed.collect()}
    C = index.centroids
    for i in range(0, N, 97):
        d = ((C - vec_np[i].astype(np.float64)) ** 2).sum(axis=1)
        assert got[i] == int(np.argmin(d))


def test_ivf_recall_at_10(spark, ivf, vectors, vec_np):
    """recall@10 >= 0.9 at nprobe=4/16 on clustered data (FIXTURES.md
    oracle rule for the ANN path)."""
    indexed, index = ivf
    queries = vec_np[RNG.integers(0, N, 20)]
    recalls = []
    for q in queries:
        exact = {r["id"] for r in knn_query(vectors, q.tolist(), k=K).collect()}
        approx = {
            r["id"]
            for r in index.search(indexed, q.tolist(), k=K, nprobe=4).collect()
        }
        recalls.append(len(exact & approx) / K)
    assert np.mean(recalls) >= 0.9


def test_ivf_batch_search_matches_single(spark, ivf, vec_np):
    indexed, index = ivf
    qn = 5
    qdf = spark.createDataFrame(
        [(i, vec_np[i].tolist()) for i in range(qn)],
        "query_id long, embedding array<float>",
    )
    batch = index.search_batch(indexed, qdf, k=K, nprobe=4)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["id"]))
    for qid in range(qn):
        single = index.search(indexed, vec_np[qid].tolist(), k=K, nprobe=4).collect()
        exp = [(r["rank"], r["id"]) for r in single]
        assert sorted(got[qid]) == sorted(exp)


def test_ivf_full_probe_equals_exact(spark, ivf, vectors, vec_np):
    """nprobe = nlist must reproduce the exact result — the ANN path
    degrades gracefully to brute force (reference fallback semantics)."""
    indexed, index = ivf
    q = vec_np[123].tolist()
    exact = [(r["rank"], r["id"]) for r in knn_query(vectors, q, k=K).collect()]
    full = [
        (r["rank"], r["id"])
        for r in index.search(indexed, q, k=K, nprobe=index.nlist).collect()
    ]
    assert full == exact


def test_incremental_assignment_no_rebuild(spark, ivf, vec_np):
    """New rows get centroid ids from the same centroids via a pure
    projection — the reference rebuilt its whole index per add."""
    indexed, index = ivf
    new = spark.createDataFrame(
        [(N + 1, (vec_np[0] + 0.01).tolist())], "id long, embedding array<float>"
    )
    row = index.assign(new).first()
    exp = int(np.argmin(((index.centroids - vec_np[0].astype(np.float64)) ** 2).sum(axis=1)))
    assert row["centroid_id"] == exp


def test_lsh_buckets_and_probes(spark, vectors, vec_np):
    bucketed, planes = add_lsh_buckets(vectors, dim=DIM, n_planes=8, seed=3)
    got = {r["id"]: r["bucket_id"] for r in bucketed.collect()}
    # numpy oracle for bucket bits
    for i in range(0, N, 211):
        bits = (planes @ vec_np[i].astype(np.float64)) > 0
        exp = int(sum(1 << j for j, b in enumerate(bits) if b))
        assert got[i] == exp
    # query probes include the query's own bucket; same-vector search hits
    q = vec_np[42]
    probes = lsh_probe_buckets(q.tolist(), planes, multiprobe=2)
    assert got[42] == probes[0]
    cand = bucketed.where(F.col("bucket_id").isin(probes))
    hit = knn_query(cand, q.tolist(), k=1).first()
    assert hit["id"] == 42


def test_lsh_plane_count_validated(spark, vectors):
    """n_planes > 30 would wrap the int32 bucket cast (non-ANSI) and
    silently corrupt assignments — rejected at construction, which covers
    build_lsh and index deserialization alike."""
    from mlx_vector_db_spark.operators.ann import LSHIndex, build_lsh

    with pytest.raises(ValueError, match="n_planes"):
        build_lsh(vectors, dim=DIM, n_planes=31)
    with pytest.raises(ValueError, match="n_planes"):
        LSHIndex.from_dict(
            {"type": "lsh", "vec_col": "embedding",
             "planes": np.zeros((31, DIM)).tolist()}
        )


def test_tune_nprobe_clustered_picks_small(spark, ivf, vectors):
    """On a clustered corpus the tuner must settle far below full probe,
    and every reported curve point must be a real measured recall."""
    from mlx_vector_db_spark.operators.ann import tune_nprobe

    indexed, index = ivf
    queries = vectors.limit(30).select(
        F.col("id").alias("query_id"), "embedding"
    )
    nprobe, curve = tune_nprobe(
        indexed, index, queries, k=K, target_recall=0.9
    )
    assert nprobe < index.nlist  # clustered: pruning genuinely works
    assert curve[nprobe] >= 0.9
    # ladder ascends and stops at the first passing candidate
    tried = sorted(curve)
    assert tried[-1] == nprobe
    assert all(0.0 <= r <= 1.0 for r in curve.values())


def test_tune_nprobe_full_probe_fallback(spark, ivf, vectors):
    """An unreachable target returns full probe (== exact scan)."""
    from mlx_vector_db_spark.operators.ann import tune_nprobe

    indexed, index = ivf
    queries = vectors.limit(10).select(
        F.col("id").alias("query_id"), "embedding"
    )
    nprobe, curve = tune_nprobe(
        indexed, index, queries, k=K, target_recall=1.0,
        candidates=[1, index.nlist],
    )
    # full probe recall is exactly 1.0 (partition-complete index)
    assert curve.get(index.nlist) == 1.0 or nprobe == 1
    with pytest.raises(ValueError, match="target_recall"):
        tune_nprobe(indexed, index, queries, target_recall=0.0)


def test_store_tune_nprobe(spark, tmp_path):
    from mlx_vector_db_spark.store import VectorStoreCatalog

    rng = np.random.default_rng(5)
    centers = rng.random((8, 16)) * 4
    assign = rng.integers(0, 8, 400)
    vecs = (centers[assign] + 0.2 * rng.standard_normal((400, 16))).astype(
        np.float32
    )
    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    st = cat.create_store("tn", "m", dimension=16)
    st.add_vectors(vecs.tolist())
    with pytest.raises(ValueError, match="build_index"):
        st.tune_nprobe()
    st.build_index(kind="ivf", nlist=8, seed=2)
    nprobe, curve = st.tune_nprobe(k=5, target_recall=0.9, sample_queries=20)
    assert 1 <= nprobe <= 8
    assert curve[nprobe] >= 0.9
    # the chosen setting actually delivers on a fresh query
    res = st.query(vecs[3].tolist(), k=1, use_index=True, nprobe=nprobe)
    assert res.first()["id"] == 3


def test_ivf_assign_arrow_matches_expr(spark):
    import numpy as np

    from mlx_vector_db_spark.operators.ann import train_ivf

    rng = np.random.default_rng(4)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(400)]
    rows += [(900 + i, rows[i][1]) for i in range(10)]  # exact-dup ties
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = train_ivf(df, nlist=130, seed=6)  # past ASSIGN_ARROW_MIN_K
    expr = {(r.vec_id, r.centroid_id) for r in idx.assign(df, method="expr").collect()}
    arrow = {(r.vec_id, r.centroid_id) for r in idx.assign(df, method="arrow").collect()}
    auto = {(r.vec_id, r.centroid_id) for r in idx.assign(df).collect()}
    assert expr == arrow == auto
    import pytest as _pytest

    with _pytest.raises(ValueError):
        idx.assign(df, method="nope")


def test_auto_nlist_rule(spark):
    import numpy as np

    from mlx_vector_db_spark.operators.ann import auto_nlist, train_ivf

    assert auto_nlist(0) == 16
    assert auto_nlist(100) == 32          # 4*10 = 40 -> nearest pow2 = 32
    assert auto_nlist(200_000) == 2048    # 4*447 ~ 1789 -> 2048
    assert auto_nlist(10**12) == 65536    # clamped
    rng = np.random.default_rng(2)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(300)],
        "vec_id long, embedding array<float>",
    )
    idx = train_ivf(df, nlist="auto", seed=1)
    assert idx.nlist == auto_nlist(300)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="auto"):
        train_ivf(df, nlist="bogus")


def test_assign_arrow_null_vectors_match_expr(spark):
    """NULL embeddings must yield NULL cell ids on BOTH assignment
    paths (the expression path gets this for free; the Arrow path used
    to hard-fail the whole batch), so the auto switch at
    ASSIGN_ARROW_MIN_K never changes ingest failure semantics."""
    import numpy as np

    from mlx_vector_db_spark.operators.ann import assign_cells_arrow, train_ivf

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(60)]
    rows += [(100, None), (101, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = train_ivf(df.where("embedding is not null"), nlist=8, seed=3)
    expr = {
        (r.vec_id, r.centroid_id)
        for r in idx.assign(df, method="expr").collect()
    }
    arrow = {
        (r.vec_id, r.centroid_id)
        for r in idx.assign(df, method="arrow").collect()
    }
    assert expr == arrow
    assert (100, None) in arrow and (101, None) in arrow
    # the dist column is NULL on NULL rows too
    with_d = assign_cells_arrow(
        df, idx.centroids, "embedding", "cid", dist_col="d"
    )
    nulls = {r.vec_id: (r.cid, r.d) for r in with_d.collect() if r.vec_id >= 100}
    assert nulls == {100: (None, None), 101: (None, None)}
