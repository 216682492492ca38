"""Store-integrated ANN index: build/persist/reload, incremental
assignment on add, probe-pruned query with exact fallback, filtered
over-fetch (reference X1-X3 + P2 + routing at
service/optimized_vector_store.py:115-145).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.store import VectorStoreCatalog

DIM = 16
N = 400
RNG = np.random.default_rng(31)


@pytest.fixture()
def catalog(spark, tmp_path):
    return VectorStoreCatalog(spark, tmp_path / "stores")


@pytest.fixture()
def indexed_store(catalog):
    st = catalog.create_store(
        "u", "m", dimension=DIM, promoted_keys={"category": "string"}
    )
    centers = RNG.random((6, DIM)) * 3
    assign = RNG.integers(0, 6, N)
    vecs = (centers[assign] + 0.2 * RNG.standard_normal((N, DIM))).astype(np.float32)
    st.add_vectors(
        vecs.tolist(), [{"category": "A" if i % 2 == 0 else "B"} for i in range(N)]
    )
    st.build_index(nlist=8, seed=5)
    st._vecs = vecs
    return st


def test_build_persists_and_reloads(catalog, indexed_store):
    assert indexed_store.stats()["index_type"] == "ivf"
    reloaded = catalog.get_store("u", "m")
    assert reloaded.config.index is not None
    assert "centroid_id" in reloaded.to_df().columns
    hit = reloaded.query(indexed_store._vecs[9].tolist(), k=1).first()
    assert hit["id"] == 9


def test_indexed_query_prunes_and_matches_exact_top1(indexed_store):
    q = indexed_store._vecs[123].tolist()
    approx = indexed_store.query(q, k=5, use_index=True, nprobe=2).collect()
    exact = indexed_store.query(q, k=5, use_index=False).collect()
    assert approx[0]["id"] == exact[0]["id"] == 123
    # pruning really happened: plan filters on centroid_id
    from mlx_vector_db_spark.plans import explain_str

    plan = explain_str(indexed_store.query(q, k=5, use_index=True, nprobe=2))
    assert "centroid_id" in plan


def test_incremental_add_assigns_centroids(indexed_store):
    new = (indexed_store._vecs[0] + 0.01).astype(np.float32)
    indexed_store.add_vectors([new.tolist()])
    row = (
        indexed_store.to_df().orderBy(F.desc("id")).limit(1).first()
    )
    assert row["centroid_id"] is not None
    # lands in the same cell as its near-twin
    twin = indexed_store.to_df().where("id = 0").first()
    assert row["centroid_id"] == twin["centroid_id"]


def test_filtered_indexed_query_soundness(indexed_store):
    q = indexed_store._vecs[10].tolist()
    res = indexed_store.query(
        q, k=5, filter_metadata={"category": "B"}, use_index=True
    ).collect()
    assert res and all(r["category"] == "B" for r in res)


def test_fallback_when_index_corrupt(indexed_store):
    indexed_store.config.index = {"type": "ivf", "vec_col": "embedding",
                                  "centroids": "garbage"}
    indexed_store._ivf_cache = None
    q = indexed_store._vecs[7].tolist()
    hit = indexed_store.query(q, k=1, use_index=True).first()
    assert hit["id"] == 7  # silent exact fallback (reference :142-145)


def test_drop_index(catalog, indexed_store):
    indexed_store.drop_index()
    assert catalog.get_store("u", "m").config.index is None
    assert indexed_store.stats()["index_type"] == "none"


def test_build_on_empty_store_raises(catalog):
    st = catalog.create_store("e", "m", dimension=DIM)
    with pytest.raises(ValueError, match="empty"):
        st.build_index()


@pytest.fixture()
def lsh_store(catalog):
    st = catalog.create_store("lu", "lm", dimension=DIM)
    vecs = RNG.random((300, DIM)).astype(np.float32) - 0.5
    st.add_vectors(vecs.tolist())
    st.build_index(kind="lsh", n_planes=4, seed=7)
    st._vecs = vecs
    return st


def test_lsh_build_persists_and_reloads(catalog, lsh_store):
    assert lsh_store.stats()["index_type"] == "lsh"
    reloaded = catalog.get_store("lu", "lm")
    assert reloaded.config.index["type"] == "lsh"
    assert "centroid_id" in reloaded.to_df().columns
    hit = reloaded.query(lsh_store._vecs[9].tolist(), k=1).first()
    assert hit["id"] == 9  # own bucket always probed -> self-hit exact


def test_lsh_full_probe_equals_exact(lsh_store):
    q = lsh_store._vecs[42].tolist()
    approx = [r["id"] for r in lsh_store.query(q, k=10, nprobe=16).collect()]
    exact = [r["id"] for r in lsh_store.query(q, k=10, use_index=False).collect()]
    assert approx == exact  # probing all 2^4 buckets degrades to exact


def test_lsh_partial_probe_prunes(lsh_store):
    from mlx_vector_db_spark.plans import explain_str

    q = lsh_store._vecs[42].tolist()
    res = lsh_store.query(q, k=5, nprobe=3)
    plan = explain_str(res)
    assert "centroid_id" in plan  # bucket predicate reached the scan
    rows = res.collect()
    assert rows and rows[0]["id"] == 42  # self-hit survives pruning


def test_lsh_incremental_add_assigns_bucket(lsh_store):
    lsh_store.add_vectors([lsh_store._vecs[0].tolist()])
    row = lsh_store.to_df().orderBy(F.desc("id")).limit(1).first()
    assert row["centroid_id"] is not None
    # identical vector -> identical bucket as the original row
    orig = lsh_store.to_df().where("id = 0").first()
    assert row["centroid_id"] == orig["centroid_id"]


def test_unknown_index_kind_raises(catalog):
    st = catalog.create_store("ku", "km", dimension=DIM)
    st.add_vectors([[0.0] * DIM])
    with pytest.raises(ValueError, match="unknown index kind"):
        st.build_index(kind="hnsw")
