"""Store-level multi-vector (token) tier: add -> pack -> code -> query
lifecycle, incremental code maintenance, saturation-aware funnel
dispatch, metadata filtering through the main table, and cleanup."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.store import VectorStoreCatalog

DIM = 16
N_DOCS = 40
TOKENS_PER_DOC = 5
RNG = np.random.default_rng(121)


@pytest.fixture()
def store(spark, tmp_path):
    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    st = cat.create_store("tok", "m", dimension=DIM)
    return st


def _token_rows(doc_ids):
    return [
        (int(d), RNG.normal(size=DIM).astype(float).tolist())
        for d in doc_ids
        for _ in range(TOKENS_PER_DOC)
    ]


@pytest.fixture()
def loaded(spark, store):
    rows = _token_rows(range(N_DOCS))
    df = spark.createDataFrame(rows, "doc_id long, embedding array<float>")
    n = store.add_token_vectors(df)
    assert n == N_DOCS * TOKENS_PER_DOC
    return store, df


def test_add_and_exact_query_matches_operator(spark, loaded):
    from mlx_vector_db_spark.operators.maxsim import maxsim_join

    store, df = loaded
    assert store.token_df().count() == N_DOCS
    queries = df.where(F.col("doc_id") < 3).withColumnRenamed(
        "doc_id", "query_id"
    )
    got = store.maxsim_query(queries, k=4, funnel=False)
    want = maxsim_join(df, queries, k=4)
    a = [(r["query_id"], r["doc_id"], r["rank"])
         for r in got.orderBy("query_id", "rank").collect()]
    e = [(r["query_id"], r["doc_id"], r["rank"])
         for r in want.orderBy("query_id", "rank").collect()]
    assert a == e
    # self-match: each query's own doc ranks first
    by_q = {q: d for q, d, r in a if r == 1}
    assert by_q == {0: 0, 1: 1, 2: 2}


def test_plain_vector_list_is_one_query(loaded):
    store, df = loaded
    toks = [r["embedding"] for r in df.where("doc_id = 7").collect()]
    out = store.maxsim_query(toks, k=3, funnel=False).collect()
    assert len(out) == 3
    assert all(r["query_id"] == 0 for r in out)
    assert out[0]["doc_id"] == 7 or [
        r for r in out if r["rank"] == 1
    ][0]["doc_id"] == 7


def test_build_token_codes_and_funnel_equals_exact_at_saturation(loaded):
    store, df = loaded
    store.build_token_codes(seed=3)
    assert store.config.token_bq is not None
    assert store.token_codes_df().count() == N_DOCS
    # persisted: a reloaded handle sees the code table + thresholds
    re = store.catalog.get_store("tok", "m")
    assert re.config.token_bq == store.config.token_bq
    queries = df.where(F.col("doc_id") < 3).withColumnRenamed(
        "doc_id", "query_id"
    )
    exact = store.maxsim_query(queries, k=4, funnel=False)
    fun = re.maxsim_query(
        queries, k=4, funnel=True, overfetch=(N_DOCS + 3) // 4
    )
    a = [(r["query_id"], r["doc_id"], r["rank"])
         for r in fun.orderBy("query_id", "rank").collect()]
    e = [(r["query_id"], r["doc_id"], r["rank"])
         for r in exact.orderBy("query_id", "rank").collect()]
    assert a == e


def test_funnel_auto_dispatch_saturation(loaded):
    """funnel=None: a small corpus saturates the candidate budget, so
    auto dispatch runs the exact sweep — results equal funnel=False;
    forcing funnel=True without codes raises."""
    store, df = loaded
    queries = df.where(F.col("doc_id") < 2).withColumnRenamed(
        "doc_id", "query_id"
    )
    with pytest.raises(ValueError, match="build_token_codes"):
        store.maxsim_query(queries, k=3, funnel=True)
    auto = store.maxsim_query(queries, k=3)  # no codes -> exact
    exact = store.maxsim_query(queries, k=3, funnel=False)
    assert [tuple(r) for r in auto.orderBy("query_id", "rank").collect()] == [
        tuple(r) for r in exact.orderBy("query_id", "rank").collect()
    ]
    store.build_token_codes()
    # 4 * M(2) * k(3) * overfetch(4) = 96 >= 40 docs -> still exact
    auto2 = store.maxsim_query(queries, k=3)
    assert [
        (r["query_id"], r["doc_id"], r["rank"])
        for r in auto2.orderBy("query_id", "rank").collect()
    ] == [
        (r["query_id"], r["doc_id"], r["rank"])
        for r in exact.orderBy("query_id", "rank").collect()
    ]
    with pytest.raises(ValueError, match="cosine"):
        store.maxsim_query(queries, k=3, funnel=True, metric="dot_product")


def test_incremental_codes_on_add(spark, loaded):
    store, df = loaded
    store.build_token_codes()
    extra = spark.createDataFrame(
        _token_rows(range(N_DOCS, N_DOCS + 5)),
        "doc_id long, embedding array<float>",
    )
    store.add_token_vectors(extra)
    assert store.token_df().count() == N_DOCS + 5
    # codes were appended for the new docs in the same call
    assert store.token_codes_df().count() == N_DOCS + 5
    # and they agree with a driver-side encode
    from mlx_vector_db_spark.operators.bq import BQModel

    model = BQModel.from_dict(store.config.token_bq)
    row = store.token_codes_df().where(F.col("doc_id") == N_DOCS).first()
    toks = [
        r["embedding"]
        for r in extra.where(F.col("doc_id") == N_DOCS).collect()
    ]
    want = model.pack(np.asarray(toks, dtype=np.float64))
    assert sorted(bytes(c) for c in row["token_codes"]) == sorted(
        c.tobytes() for c in want
    )


def test_filter_metadata_through_main_table(spark, loaded):
    """filter_metadata filters the MAIN table and semi-joins its ids
    into the token scan (doc_id == id contract)."""
    store, df = loaded
    vecs = RNG.random((N_DOCS, DIM)).astype(np.float32)
    store.add_vectors(
        vecs.tolist(),
        [{"category": "A" if i % 2 == 0 else "B"} for i in range(N_DOCS)],
        ids=list(range(N_DOCS)),
    )
    queries = df.where(F.col("doc_id") < 2).withColumnRenamed(
        "doc_id", "query_id"
    )
    out = store.maxsim_query(
        queries, k=5, funnel=False, filter_metadata={"category": "A"}
    ).collect()
    assert out and all(r["doc_id"] % 2 == 0 for r in out)
    # parity with operator-level filtering on the same doc subset
    from mlx_vector_db_spark.operators.maxsim import maxsim_join

    want = maxsim_join(
        df.where(F.col("doc_id") % 2 == 0), queries, k=5
    )
    a = [(r["query_id"], r["doc_id"], r["rank"]) for r in out]
    e = [(r["query_id"], r["doc_id"], r["rank"]) for r in want.collect()]
    assert sorted(a) == sorted(e)


def test_validation_and_null_rule(spark, store):
    # non-integral doc ids fail fast
    bad = spark.createDataFrame(
        [("a", [0.0] * DIM)], "doc_id string, embedding array<float>"
    )
    with pytest.raises(ValueError, match="integral"):
        store.add_token_vectors(bad)
    # wrong dimension rejected
    wrong = spark.createDataFrame(
        [(1, [0.0] * (DIM + 1))], "doc_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="dimension"):
        store.add_token_vectors(wrong)
    # non-finite rejected
    nf = spark.createDataFrame(
        [(1, [float("nan")] * DIM)], "doc_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="finite"):
        store.add_token_vectors(nf)
    # NULL tokens dropped (engine rule), not errors; all-NULL doc -> 0
    mixed = spark.createDataFrame(
        [(1, [0.5] * DIM), (1, None), (2, None)],
        "doc_id long, embedding array<float>",
    )
    assert store.add_token_vectors(mixed) == 1
    assert store.token_df().count() == 1
    # empty token table cannot build codes
    store.drop_token_vectors()
    with pytest.raises(ValueError, match="empty token table"):
        store.build_token_codes()


def test_packed_add_and_lifecycle_cleanup(spark, loaded):
    from mlx_vector_db_spark.operators.maxsim import pack_doc_tokens

    store, df = loaded
    packed = pack_doc_tokens(
        spark.createDataFrame(
            _token_rows(range(100, 103)),
            "doc_id long, embedding array<float>",
        )
    )
    store.add_token_vectors(packed, packed=True)
    assert store.token_df().count() == N_DOCS + 3
    store.build_token_codes()
    st = store.stats()
    assert st["tokens"] is True and st["token_codes"] is True
    # drop the tier only
    store.drop_token_vectors()
    assert store.token_df().count() == 0
    assert store.config.token_bq is None
    assert store.stats()["tokens"] is False
    # delete_store reaps token dirs too
    tok_dir = store.tokens_dir
    store.add_token_vectors(df)
    assert tok_dir.exists()
    store.catalog.delete_store("tok", "m")
    assert not tok_dir.exists()


def test_build_reuses_store_bq_thresholds(spark, loaded):
    """When build_bq has run, token codes reuse the doc-level
    thresholds (one artifact, consistent estimator)."""
    store, df = loaded
    vecs = RNG.random((50, DIM)).astype(np.float32)
    store.add_vectors(vecs.tolist(), [{}] * 50)
    store.build_bq()
    store.build_token_codes()
    assert store.config.token_bq["thresholds"] == store.config.bq["thresholds"]


def test_optimize_tokens_compacts_and_preserves(spark, store):
    """r12: micro-batch token adds accumulate part-files; optimize_tokens
    compacts both tier tables to range-partitioned files with identical
    contents and query results."""
    for b in range(5):
        store.add_token_vectors(
            spark.createDataFrame(
                _token_rows(range(b * 4, b * 4 + 4)),
                "doc_id long, embedding array<float>",
            )
        )
    store.build_token_codes()
    files_before = len(list(store.tokens_dir.glob("*.parquet")))
    assert files_before >= 5
    queries = spark.createDataFrame(
        _token_rows(range(2)), "doc_id long, embedding array<float>"
    ).withColumnRenamed("doc_id", "query_id")
    before = sorted(
        (r["query_id"], r["doc_id"], r["rank"])
        for r in store.maxsim_query(queries, k=3, funnel=False).collect()
    )
    n_files = store.optimize_tokens(target_files=2)
    assert n_files <= 2 + 1  # range partitioner may emit an empty split
    assert store.token_df().count() == 20
    assert store.token_codes_df().count() == 20
    after = sorted(
        (r["query_id"], r["doc_id"], r["rank"])
        for r in store.maxsim_query(queries, k=3, funnel=False).collect()
    )
    assert after == before
    # no-op on an empty tier
    store.drop_token_vectors()
    assert store.optimize_tokens() == 0
