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
    """funnel=None runs the exact sweep (r13: the measured winner at
    every locally reachable shape — the funnel is opt-in) — results
    equal funnel=False; forcing funnel=True without codes raises."""
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
    # codes built -> auto STILL runs exact (the funnel is opt-in)
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


def test_build_trains_token_thresholds_by_default(spark, loaded):
    """r13 (ADVICE r12): token codes train on the TOKEN distribution by
    default even when doc-level BQ thresholds exist — means from a
    different vector distribution can sit far from the token means and
    silently degrade funnel recall. Reuse is explicit opt-in."""
    store, df = loaded
    # doc vectors drawn from a SHIFTED distribution vs the tokens
    vecs = (RNG.random((50, DIM)) + 0.5).astype(np.float32)
    store.add_vectors(vecs.tolist(), [{}] * 50)
    store.build_bq()
    store.build_token_codes()
    assert store.config.token_bq["thresholds"] != store.config.bq["thresholds"]
    # explicit opt-in reuses the doc-level artifact
    store.build_token_codes(reuse_doc_thresholds=True)
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


# -- r13: append-once contract, replace/delete, manifest durability ----------


def test_duplicate_doc_ids_fail_fast(spark, loaded):
    """r13 (VERDICT r12 #2): re-adding an existing doc_id raises instead
    of silently scoring one doc as two."""
    store, df = loaded
    dup = spark.createDataFrame(
        _token_rows([3, 99]), "doc_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="already present"):
        store.add_token_vectors(dup)
    # nothing landed — neither the fresh id nor the duplicate
    assert store.token_df().count() == N_DOCS
    # disjoint ids still append (the footer-watermark fast path)
    fresh = spark.createDataFrame(
        _token_rows([100, 101]), "doc_id long, embedding array<float>"
    )
    assert store.add_token_vectors(fresh) == 2 * TOKENS_PER_DOC
    assert store.token_df().count() == N_DOCS + 2


def test_replace_reindexes_doc_and_codes_in_sync(spark, loaded):
    """on_conflict='replace': the doc's packed row AND its sign-bit codes
    are swapped atomically; the re-indexed content wins the query."""
    store, df = loaded
    store.build_token_codes(seed=7)
    # re-index doc 5 with doc 9's token content
    new_tokens = [
        (5, r["embedding"])
        for r in df.where("doc_id = 9").collect()
    ]
    batch = spark.createDataFrame(
        new_tokens, "doc_id long, embedding array<float>"
    )
    n = store.add_token_vectors(batch, on_conflict="replace")
    assert n == TOKENS_PER_DOC
    # still one packed row per doc, codes in lockstep
    assert store.token_df().count() == N_DOCS
    assert store.token_codes_df().count() == N_DOCS
    assert (
        store.token_df().where("doc_id = 5").count() == 1
    )
    # doc 5 now scores like doc 9: query with doc 9's tokens -> both tie at top
    q = df.where("doc_id = 9").withColumnRenamed("doc_id", "query_id")
    top2 = {
        r["doc_id"]
        for r in store.maxsim_query(q, k=2, funnel=False).collect()
    }
    assert top2 == {5, 9}


def test_delete_token_vectors_prunes_both_tables(spark, loaded):
    store, df = loaded
    store.build_token_codes(seed=7)
    removed = store.delete_token_vectors([2, 7, 999])
    assert removed == 2
    assert store.token_df().count() == N_DOCS - 2
    assert store.token_codes_df().count() == N_DOCS - 2
    q = df.where("doc_id = 2").withColumnRenamed("doc_id", "query_id")
    got = {r["doc_id"] for r in store.maxsim_query(q, k=5, funnel=False).collect()}
    assert 2 not in got and 7 not in got
    # deleting already-gone ids is a no-op
    assert store.delete_token_vectors([2, 7]) == 0
    # deleted ids can be re-added (append-once means live-set-once)
    assert store.add_token_vectors(
        spark.createDataFrame(
            _token_rows([2]), "doc_id long, embedding array<float>"
        )
    ) == TOKENS_PER_DOC


def test_unchecked_skips_probe(spark, loaded):
    """on_conflict='unchecked' is the caller-guarantees escape hatch: no
    probe runs, so even a duplicate lands (documented foot-gun)."""
    store, df = loaded
    dup = spark.createDataFrame(
        _token_rows([0]), "doc_id long, embedding array<float>"
    )
    store.add_token_vectors(dup, on_conflict="unchecked")
    assert store.token_df().where("doc_id = 0").count() == 2


def test_manifest_hides_stray_part_files(spark, loaded, tmp_path):
    """Readers resolve through the tier manifest: a part-file a crashed
    mutation left behind (staged in, never committed) is invisible."""
    store, df = loaded
    assert (store._token_meta_dir / "CURRENT").exists()
    # simulate a crash-after-stage: a valid parquet file in the dir
    stray = store.token_df().limit(1)
    stray_dir = tmp_path / "stray"
    stray.write.mode("overwrite").parquet(str(stray_dir))
    import shutil as _sh
    import uuid as _uuid

    for p in stray_dir.glob("*.parquet"):
        _sh.copy(p, store.tokens_dir / f"part-{_uuid.uuid4().hex}.parquet")
    assert store.token_df().count() == N_DOCS  # stray not visible
    # and the next commit reaps nothing it doesn't own — count stays right
    store.add_token_vectors(
        spark.createDataFrame(
            _token_rows([500]), "doc_id long, embedding array<float>"
        )
    )
    assert store.token_df().count() == N_DOCS + 1


def test_forced_funnel_disables_delegation(spark, loaded, monkeypatch):
    """maxsim_query(funnel=True) must exercise the two-pass funnel even
    on small corpora (ADVICE r12): delegate_saturation=None is passed;
    auto dispatch keeps the default delegation rule."""
    from mlx_vector_db_spark.operators import maxsim as M

    store, df = loaded
    store.build_token_codes(seed=7)
    seen = {}
    real = M.maxsim_funnel

    def spy(*a, **kw):
        seen.update(kw)
        return real(*a, **kw)

    monkeypatch.setattr(M, "maxsim_funnel", spy)
    q = df.where("doc_id < 2").withColumnRenamed("doc_id", "query_id")
    store.maxsim_query(q, k=2, funnel=True, overfetch=len(range(N_DOCS)))
    assert seen.get("delegate_saturation", "absent") is None


def test_vacuum_reaps_token_orphans_keeps_live(spark, loaded, tmp_path):
    """A crash between move-in and the manifest flip strands invisible
    part-files; catalog.vacuum reaps them (aged) and never touches
    committed tier files."""
    store, df = loaded
    store.build_token_codes(seed=7)
    import os
    import shutil as _sh
    import time as _time
    import uuid as _uuid

    stray_src = tmp_path / "stray2"
    store.token_df().limit(1).write.mode("overwrite").parquet(str(stray_src))
    strays = []
    for d in (store.tokens_dir, store.token_codes_dir):
        for p in stray_src.glob("*.parquet"):
            dst = d / f"part-{_uuid.uuid4().hex}.parquet"
            _sh.copy(p, dst)
            strays.append(dst)
    # age the strays past the retention window
    old = _time.time() - 7200
    for s in strays:
        os.utime(s, (old, old))
    n = store.catalog.vacuum(min_age_seconds=3600)
    assert n >= len(strays)
    assert not any(s.exists() for s in strays)
    # committed data intact
    assert store.token_df().count() == N_DOCS
    assert store.token_codes_df().count() == N_DOCS
    # young orphans survive (in-flight mutation protection)
    young = store.tokens_dir / f"part-{_uuid.uuid4().hex}.parquet"
    _sh.copy(next(iter(stray_src.glob("*.parquet"))), young)
    store.catalog.vacuum(min_age_seconds=3600)
    assert young.exists()


def test_token_lifecycle_sequence_matches_model(spark, store):
    """Scripted add/replace/delete/build/optimize interleaving vs a
    driver-side dict model: the tier's packed contents equal the model
    after every mutation, and codes stay in doc lockstep."""
    model = {}

    def tokens_for(ids, salt):
        rng = np.random.default_rng(1000 + salt)
        return {
            int(d): [rng.normal(size=DIM).astype(float).tolist()
                     for _ in range(3)]
            for d in ids
        }

    def add(ids, salt, on_conflict="error"):
        batch = tokens_for(ids, salt)
        rows = [(d, t) for d, toks in batch.items() for t in toks]
        store.add_token_vectors(
            spark.createDataFrame(rows, "doc_id long, embedding array<float>"),
            on_conflict=on_conflict,
        )
        model.update(batch)

    def check():
        got = {
            r["doc_id"]: sorted(tuple(round(x, 5) for x in t)
                                for t in r["token_vecs"])
            for r in store.token_df().collect()
        }
        want = {
            d: sorted(tuple(round(x, 5) for x in t) for t in toks)
            for d, toks in model.items()
        }
        assert got == want
        if store.config.token_bq:
            code_ids = {r["doc_id"] for r in
                        store.token_codes_df().select("doc_id").collect()}
            assert code_ids == set(model)

    add(range(8), salt=0)
    check()
    store.build_token_codes(seed=5)
    check()
    add(range(8, 12), salt=1)
    check()
    add([2, 3], salt=2, on_conflict="replace")
    check()
    removed = store.delete_token_vectors([0, 5, 99])
    assert removed == 2
    for d in (0, 5):
        model.pop(d)
    check()
    store.optimize_tokens(target_files=2)
    check()
    add([0], salt=3)  # deleted id is re-addable
    check()


def test_concurrent_appends_serialize_under_tier_lock(spark, store):
    """Four threads appending disjoint doc_id ranges concurrently: the
    tier mutation lock serializes the commits, every batch lands, and
    the final manifest is consistent (no lost append — the pre-r13
    staged-swap interleaving hazard)."""
    import threading

    errs = []

    def worker(base):
        try:
            rows = _token_rows(range(base, base + 5))
            store.add_token_vectors(
                spark.createDataFrame(
                    rows, "doc_id long, embedding array<float>"
                )
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(b,))
               for b in (0, 100, 200, 300)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert store.token_df().count() == 20
    ids = {r["doc_id"] for r in store.token_df().select("doc_id").collect()}
    assert ids == set(range(0, 5)) | set(range(100, 105)) | set(
        range(200, 205)
    ) | set(range(300, 305))


def test_store_funnel_pushes_candidate_filter(spark, loaded):
    """r13: the store-native funnel's pass-2 re-rank pushes the
    driver-bounded candidate id list into the tier's parquet scan
    (PushedFilters In(doc_id, ...)) — the byte story measured in
    BENCH_r13_maxsim_throttled.json."""
    store, df = loaded
    store.build_token_codes(seed=7)
    store.optimize_tokens(target_files=2)
    q = df.where("doc_id < 2").withColumnRenamed("doc_id", "query_id")
    out = store.maxsim_query(q, k=3, funnel=True, overfetch=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "In(doc_id" in plan
