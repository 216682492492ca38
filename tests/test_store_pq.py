"""Store-integrated product quantization: build_pq persists codebooks,
codes maintain incrementally on add, and query() runs the ADC first
pass + exact re-rank (top-k identical to the exact scan)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.store import VectorStoreCatalog

DIM = 32
RNG = np.random.default_rng(17)


@pytest.fixture()
def store(spark, tmp_path):
    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    st = cat.create_store(
        "pqs", "m", dimension=DIM,
        promoted_keys={"category": "string"},
    )
    vecs = RNG.random((300, DIM)).astype(np.float32)
    meta = [{"category": "A" if i % 2 == 0 else "B"} for i in range(300)]
    st.add_vectors(vecs.tolist(), meta)
    st._test_vecs = vecs
    return st


def test_build_pq_persists_and_codes_materialize(store):
    store.build_pq(m=4, nbits=8)
    df = store.to_df()
    assert "pq_code" in df.columns
    row = df.first()
    assert len(row["pq_code"]) == 4
    assert store.stats()["pq"] is True
    # reload from config: codebooks survive the round-trip
    reloaded = store.catalog.get_store("pqs", "m")
    assert reloaded._pq().m == 4
    assert reloaded.to_df().count() == 300


def test_pq_query_matches_exact_topk(store):
    store.build_pq(m=4, nbits=8)
    q = store._test_vecs[42].tolist()
    got = [r["id"] for r in store.query(q, k=5, use_quantized=True).collect()]
    exact = [r["id"] for r in store.query(q, k=5, use_quantized=False).collect()]
    assert got == exact
    assert got[0] == 42  # self-match survives the compressed first pass
    # filtered query keeps pre-filter semantics through the ADC pass
    hits = store.query(q, k=5, filter_metadata={"category": "A"}).collect()
    assert hits and all(r["category"] == "A" for r in hits)


def test_pq_codes_assigned_incrementally_on_add(store):
    store.build_pq(m=4, nbits=8)
    new = RNG.random((10, DIM)).astype(np.float32)
    store.add_vectors(new.tolist(), [{"category": "C"}] * 10)
    df = store.to_df()
    assert df.count() == 310
    assert df.where(F.col("pq_code").isNull()).count() == 0
    # the incremental codes equal a fresh driver-side assignment
    pqc = store._pq()
    row = df.where(F.col("category") == "C").first()
    expect = pqc._assign(np.asarray([row["embedding"]], dtype=np.float64))[0]
    assert bytes(row["pq_code"]) == expect.tobytes()


def test_pq_composes_with_cell_index(store):
    """PQ + IVF on one store: probe pruning first, ADC on the survivors,
    exact re-rank last — all three artifacts persisted independently."""
    store.build_index(nlist=4)
    store.build_pq(m=4, nbits=8)
    df = store.to_df()
    assert {"centroid_id", "pq_code"} <= set(df.columns)
    q = store._test_vecs[7].tolist()
    hit = store.query(q, k=1, use_index=True, use_quantized=True).first()
    assert hit["id"] == 7
    store.drop_pq()
    assert "pq_code" not in store.to_df().columns


def test_pq_batch_query_matches_exact(store, spark):
    store.build_pq(m=4, nbits=8)
    qn = 5
    queries = spark.createDataFrame(
        [(i, store._test_vecs[i].tolist()) for i in range(qn)],
        "query_id long, embedding array<float>",
    )
    got = {
        (r["query_id"], r["rank"]): r["id"]
        for r in store.batch_query(queries, k=5, use_quantized=True).collect()
    }
    exact = {
        (r["query_id"], r["rank"]): r["id"]
        for r in store.batch_query(queries, k=5, use_quantized=False).collect()
    }
    assert got == exact
    assert all(got[(q, 1)] == q for q in range(qn))  # self-matches


def test_residual_ivfpq_store_path(store, spark):
    """build_index + build_pq defaults to residual codes (classic
    IVF-PQ); query routes the fused kernel and matches the exact scan;
    incremental adds encode residuals against the persisted centroids;
    the index can't be dropped out from under residual codes."""
    store.build_index(nlist=4)
    store.build_pq(m=4, nbits=8)
    assert store.config.pq["residual"] is True
    q = store._test_vecs[42].tolist()
    got = [r["id"] for r in store.query(q, k=5, use_quantized=True).collect()]
    exact = [r["id"] for r in store.query(q, k=5, use_quantized=False, use_index=False).collect()]
    assert got == exact and got[0] == 42
    # incremental add: residual codes equal a fresh driver-side encode
    new = RNG.random((5, DIM)).astype(np.float32)
    store.add_vectors(new.tolist())
    pqc, ivf = store._pq(), store._ivf()
    row = store.to_df().orderBy(F.col("id").desc()).first()
    resid = np.asarray([row["embedding"]], dtype=np.float64) - ivf.centroids[row["centroid_id"]]
    assert bytes(row["pq_code"]) == pqc._assign(resid)[0].tobytes()
    # dropping the index under residual codes is rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="residual"):
        store.drop_index()
    store.drop_pq()
    store.drop_index()  # fine once codes are gone


def test_residual_requires_ivf(store):
    with pytest.raises(ValueError, match="IVF"):
        store.build_pq(m=4, residual=True)


def test_lsh_index_gets_plain_codes(spark, tmp_path):
    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    st = cat.create_store("lshpq", "m", dimension=8)
    st.add_vectors(RNG.random((50, 8)).astype(np.float32).tolist())
    st.build_index(kind="lsh", n_planes=3)
    st.build_pq(m=4, nbits=6)
    assert st.config.pq["residual"] is False
    q = st.to_df().first()["embedding"]
    assert st.query(list(q), k=1, use_index=False, use_quantized=True).first() is not None


def test_rebuild_index_rejected_under_residual_codes(store):
    """Rebuilding the index would silently corrupt residual codes (they
    decode against the OLD centroids) — rejected like drop_index."""
    store.build_index(nlist=4)
    store.build_pq(m=4, nbits=8)
    with pytest.raises(ValueError, match="residual"):
        store.build_index(nlist=8)
    store.drop_pq()
    store.build_index(nlist=8)  # fine once codes are gone
    assert store._ivf().nlist == 8


def test_residual_query_without_index_still_compressed(store):
    """use_index=False on a residual store keeps the compressed scan:
    the fused kernel full-probes instead of silently degrading to the
    uncompressed exact scan."""
    store.build_index(nlist=4)
    store.build_pq(m=4, nbits=8)
    q = store._test_vecs[3].tolist()
    got = [r["id"] for r in store.query(q, k=5, use_index=False, use_quantized=True).collect()]
    exact = [r["id"] for r in store.query(q, k=5, use_index=False, use_quantized=False).collect()]
    assert got == exact and got[0] == 3


def test_batch_query_falls_back_on_corrupt_pq(store, spark):
    store.build_pq(m=4, nbits=8)
    store.config.pq["books"] = "corrupt"  # simulate a bad artifact
    store._pq_cache = None
    queries = spark.createDataFrame(
        [(0, store._test_vecs[0].tolist())], "query_id long, embedding array<float>"
    )
    out = store.batch_query(queries, k=3, use_quantized=True).collect()
    assert [r["id"] for r in out][0] == 0  # silent exact fallback


def test_store_tune_overfetch(store):
    """Store-level self-calibration: plain PQ codes, self-retrieval
    sample — returns a ladder rung meeting the target with its measured
    curve; raises without codes."""
    with pytest.raises(ValueError, match="build_pq"):
        store.tune_overfetch()
    store.build_pq(m=4, nbits=8)
    chosen, curve = store.tune_overfetch(
        k=5, target_recall=0.9, sample_queries=16
    )
    assert chosen in curve and curve[chosen] >= 0.9
    assert all(curve[c] < 0.9 for c in curve if c < chosen)


def test_pq_tier_saturation_take_is_raw_overfetch(store, spark):
    """ADVICE r11: the batch_query saturation guard uses the take of the
    tier actually attempted. A PQ-only store over-fetches k*overfetch
    (no BQ floor-16), so at 1 query * k=10 * overfetch=4 * 4 = 160 <
    300 rows the compressed first pass must STAY (pruned LeftSemi in
    the plan) — the old guard's BQ-floored take (640 >= 300) disabled
    it 4x early. Values equal exact either way."""
    store.build_pq(m=4, nbits=8)
    one = spark.createDataFrame(
        [(0, store._test_vecs[3].tolist())],
        "query_id long, embedding array<float>",
    )
    pruned = store.batch_query(one, k=10, use_quantized=True, overfetch=4)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    # and the raw take saturates too when big enough: 1*10*32*4 >= 300
    sat = store.batch_query(one, k=10, use_quantized=True, overfetch=32)
    assert "LeftSemi" not in sat._jdf.queryExecution().executedPlan().toString()
    exact = store.batch_query(one, k=10, use_quantized=False)
    a = [(r["query_id"], r["id"]) for r in pruned.orderBy("rank").collect()]
    e = [(r["query_id"], r["id"]) for r in exact.orderBy("rank").collect()]
    assert a == e
