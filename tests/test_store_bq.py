"""Store-integrated binary quantization: build_bq persists thresholds,
sign codes maintain incrementally on add, query() runs the Hamming
first pass + exact re-rank (top-k identical to the exact scan), and
the tier slots correctly into the compression-ladder dispatch
(PQ > BQ > int8)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.store import VectorStoreCatalog

DIM = 32
RNG = np.random.default_rng(29)


@pytest.fixture()
def store(spark, tmp_path):
    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    st = cat.create_store(
        "bqs", "m", dimension=DIM,
        promoted_keys={"category": "string"},
    )
    vecs = RNG.random((300, DIM)).astype(np.float32)
    meta = [{"category": "A" if i % 2 == 0 else "B"} for i in range(300)]
    st.add_vectors(vecs.tolist(), meta)
    st._test_vecs = vecs
    return st


def test_build_bq_persists_and_codes_materialize(store):
    store.build_bq()
    df = store.to_df()
    assert "bq_code" in df.columns
    row = df.first()
    assert len(row["bq_code"]) == DIM // 8
    assert store.stats()["bq"] is True
    # reload from config: thresholds survive the round-trip
    reloaded = store.catalog.get_store("bqs", "m")
    assert reloaded._bq().dim == DIM
    assert reloaded.to_df().count() == 300


def test_bq_query_matches_exact_topk(store):
    store.build_bq()
    q = store._test_vecs[42].tolist()
    got = [r["id"] for r in store.query(q, k=5, use_quantized=True).collect()]
    exact = [r["id"] for r in store.query(q, k=5, use_quantized=False).collect()]
    # at the 16-floored over-fetch the sign-code pass is honestly
    # approximate on uniform data (the gate's territory): require the
    # self-match, exact-score ordering of the hits, and >= 4/5 overlap
    assert got[0] == 42
    assert len(set(got) & set(exact)) >= 4
    assert [i for i in got if i in exact] == [i for i in exact if i in got]
    # a deep over-fetch makes the two-pass result EXACTLY the exact scan
    deep = [r["id"] for r in store.query(q, k=5, overfetch=64).collect()]
    assert deep == exact
    # filtered query keeps pre-filter semantics through the Hamming pass
    hits = store.query(q, k=5, filter_metadata={"category": "A"}).collect()
    assert hits and all(r["category"] == "A" for r in hits)


def test_bq_codes_assigned_incrementally_on_add(store):
    store.build_bq()
    new = RNG.random((10, DIM)).astype(np.float32)
    store.add_vectors(new.tolist(), [{"category": "C"}] * 10)
    df = store.to_df()
    assert df.count() == 310
    assert df.where(F.col("bq_code").isNull()).count() == 0
    # the incremental codes equal a fresh driver-side pack
    bqm = store._bq()
    row = df.where(F.col("category") == "C").first()
    expect = bqm.pack(np.asarray([row["embedding"]], dtype=np.float64))[0]
    assert bytes(row["bq_code"]) == expect.tobytes()


def test_bq_batch_query_first_pass(store):
    store.build_bq()
    queries = store.catalog.spark.createDataFrame(
        [(i, store._test_vecs[i].tolist()) for i in range(3)],
        "query_id long, embedding array<float>",
    )
    got = store.batch_query(queries, k=3, use_quantized=True, overfetch=64)
    exact = store.batch_query(queries, k=3, use_quantized=False)
    a = [(r["query_id"], r["id"]) for r in got.orderBy("query_id", "rank").collect()]
    e = [(r["query_id"], r["id"]) for r in exact.orderBy("query_id", "rank").collect()]
    assert a == e


def test_pq_preferred_over_bq_and_drop_falls_back(store):
    """Compression-ladder precedence: with PQ and BQ both built, query()
    takes the ADC pass (finer per byte); dropping PQ falls through to
    the Hamming pass; dropping BQ too falls back to the exact scan —
    all three return the identical (re-ranked) top-k."""
    store.build_pq(m=4, nbits=8)
    store.build_bq()
    assert store.stats()["pq"] and store.stats()["bq"]
    q = store._test_vecs[7].tolist()
    # overfetch deep enough that every tier's two-pass result is exact
    with_both = [r["id"] for r in store.query(q, k=5, overfetch=64).collect()]
    store.drop_pq()
    with_bq = [r["id"] for r in store.query(q, k=5, overfetch=64).collect()]
    store.drop_bq()
    exact = [r["id"] for r in store.query(q, k=5, use_quantized=False).collect()]
    assert with_both == with_bq == exact
    assert store.stats()["bq"] is False


def test_build_bq_empty_store_raises(spark, tmp_path):
    cat = VectorStoreCatalog(spark, tmp_path / "stores2")
    st = cat.create_store("empty", "m", dimension=DIM)
    with pytest.raises(ValueError, match="empty"):
        st.build_bq()


def test_rebuild_bq_replaces_codes(store):
    store.build_bq()
    first = store.config.bq["thresholds"]
    # append shifts the corpus mean; rebuilding retrains thresholds
    new = (RNG.random((50, DIM)) + 1.0).astype(np.float32)
    store.add_vectors(new.tolist(), [{"category": "D"}] * 50)
    store.build_bq()
    second = store.config.bq["thresholds"]
    assert first != second
    assert store.to_df().where(F.col("bq_code").isNull()).count() == 0


def test_batch_query_saturation_guard(store):
    """r11: batch_query skips the quantized first pass when
    M*k*overfetch over-fetches most of the store (the bq/pq operator
    rule) — the plan loses its pruning semi-join but values are the
    exact top-k either way; an UNsaturated call keeps the pruned plan."""
    store.build_bq()
    spark = store.catalog.spark
    one = spark.createDataFrame(
        [(0, store._test_vecs[0].tolist())],
        "query_id long, embedding array<float>",
    )
    # saturated: 1 query * k=10 * floor(16) * 4 = 640 >= 300 rows
    sat = store.batch_query(one, k=10, use_quantized=True, overfetch=4)
    assert "LeftSemi" not in sat._jdf.queryExecution().executedPlan().toString()
    # unsaturated: 1 * k=1 * floor(16) * 4 = 64 < 300 rows
    unsat = store.batch_query(one, k=1, use_quantized=True, overfetch=1)
    assert "LeftSemi" in unsat._jdf.queryExecution().executedPlan().toString()
    exact = store.batch_query(one, k=10, use_quantized=False)
    a = [(r["query_id"], r["id"]) for r in sat.orderBy("rank").collect()]
    e = [(r["query_id"], r["id"]) for r in exact.orderBy("rank").collect()]
    assert a == e
