"""Exact k-NN operators vs a NumPy brute-force oracle.

Covers the reference's invariants (FIXTURES.md oracle rules): self-query
rank 1 with sim≈1, filter soundness + pre-filter semantics, k-clamping,
deterministic tie-break, and parity between the expression path and the
Arrow block-matmul path.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.functions.vector import NORM_EPS
from mlx_vector_db_spark.operators.knn import knn_join, knn_join_blocked, knn_query

N, DIM, NQ, K = 200, 16, 7, 10
RNG = np.random.default_rng(42)


@pytest.fixture(scope="module")
def vec_np():
    v = RNG.random((N, DIM)).astype(np.float32)
    v[3] = 0.0  # zero vector exercises the eps clamp
    v[10] = v[11]  # duplicate rows exercise the id tie-break
    return v


@pytest.fixture(scope="module")
def vectors(spark, vec_np):
    rows = [
        (i, vec_np[i].tolist(), "A" if i % 2 == 0 else "B", int(i % 3))
        for i in range(N)
    ]
    return spark.createDataFrame(
        rows, "id long, embedding array<float>, category string, priority int"
    ).cache()


@pytest.fixture(scope="module")
def queries_np(vec_np):
    q = RNG.random((NQ, DIM)).astype(np.float32)
    q[0] = vec_np[17]  # self-query case
    return q


@pytest.fixture(scope="module")
def queries(spark, queries_np):
    rows = [(i, queries_np[i].tolist()) for i in range(NQ)]
    return spark.createDataFrame(rows, "query_id long, embedding array<float>")


def oracle_topk(vec_np, q, metric, k, mask=None):
    V = vec_np.astype(np.float64)
    qq = q.astype(np.float64)
    ids = np.arange(len(V))
    if mask is not None:
        V, ids = V[mask], ids[mask]
    if metric == "cosine":
        vn = np.maximum(np.linalg.norm(V, axis=1), NORM_EPS)
        qn = max(np.linalg.norm(qq), NORM_EPS)
        s = (V @ qq) / (vn * qn)
        order = np.lexsort((ids, -s))
    elif metric == "dot_product":
        s = V @ qq
        order = np.lexsort((ids, -s))
    else:
        s = np.linalg.norm(V - qq, axis=1)
        order = np.lexsort((ids, s))
    take = order[: min(k, len(ids))]
    return ids[take].tolist(), s[take].tolist()


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot_product"])
def test_knn_query_matches_oracle(spark, vectors, vec_np, queries_np, metric):
    q = queries_np[1]
    got = knn_query(vectors, q.tolist(), k=K, metric=metric).collect()
    exp_ids, exp_scores = oracle_topk(vec_np, q, metric, K)
    assert [r["id"] for r in got] == exp_ids
    assert [r["rank"] for r in got] == list(range(1, len(exp_ids) + 1))
    for r, s in zip(got, exp_scores):
        assert r["score"] == pytest.approx(s, abs=1e-5)


def test_self_query_rank1(spark, vectors, vec_np):
    got = knn_query(vectors, vec_np[17].tolist(), k=3, metric="cosine").collect()
    assert got[0]["id"] == 17
    assert got[0]["similarity"] > 0.999


def test_duplicate_rows_tie_break_by_id(spark, vectors, vec_np):
    got = knn_query(vectors, vec_np[10].tolist(), k=2, metric="cosine").collect()
    assert [r["id"] for r in got] == [10, 11]


def test_k_clamped_to_matching_rows(spark, vectors, vec_np):
    got = knn_query(
        vectors, vec_np[0].tolist(), k=5000, metric="cosine"
    ).collect()
    assert len(got) == N


def test_filtered_knn_is_prefilter_semantics(spark, vectors, vec_np, queries_np):
    q = queries_np[2]
    got = knn_query(
        vectors, q.tolist(), k=K, metric="cosine",
        filter_metadata={"category": "A", "priority": 1},
    ).collect()
    mask = np.array([(i % 2 == 0) and (i % 3 == 1) for i in range(N)])
    exp_ids, _ = oracle_topk(vec_np, q, "cosine", K, mask=mask)
    assert [r["id"] for r in got] == exp_ids
    for r in got:
        assert r["category"] == "A" and r["priority"] == 1


def test_no_match_filter_returns_empty(spark, vectors, vec_np):
    got = knn_query(
        vectors, vec_np[0].tolist(), k=5, filter_metadata={"category": "C"}
    ).collect()
    assert got == []


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot_product"])
def test_knn_join_matches_oracle(spark, vectors, queries, vec_np, queries_np, metric):
    got = knn_join(vectors, queries, k=K, metric=metric).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(NQ))
    for qid in range(NQ):
        rows = sorted(by_q[qid], key=lambda r: r["rank"])
        exp_ids, exp_scores = oracle_topk(vec_np, queries_np[qid], metric, K)
        assert [r["id"] for r in rows] == exp_ids
        for r, s in zip(rows, exp_scores):
            assert r["score"] == pytest.approx(s, abs=1e-5)


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot_product"])
def test_blocked_path_parity(spark, vectors, queries, metric):
    a = knn_join(vectors, queries, k=K, metric=metric)
    b = knn_join_blocked(vectors, queries, k=K, metric=metric)
    pa = {(r["query_id"], r["rank"]): (r["id"], r["score"]) for r in a.collect()}
    pb = {(r["query_id"], r["rank"]): (r["id"], r["score"]) for r in b.collect()}
    assert pa.keys() == pb.keys()
    for key in pa:
        assert pa[key][0] == pb[key][0]
        assert pa[key][1] == pytest.approx(pb[key][1], abs=1e-9)


def test_knn_query_plan_is_take_ordered(spark, vectors, vec_np):
    plan = knn_query(vectors, vec_np[0].tolist(), k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize("metric", ["cosine", "euclidean"])
def test_chunked_path_parity(spark, vectors, queries, metric):
    from mlx_vector_db_spark.operators.knn import knn_join_chunked

    a = knn_join(vectors, queries, k=K, metric=metric)
    # chunk_size=3 forces ceil(7/3)=3 hash chunks, exercising the union
    b = knn_join_chunked(vectors, queries, k=K, metric=metric, chunk_size=3)
    pa = {(r["query_id"], r["rank"]): (r["id"], r["score"]) for r in a.collect()}
    pb = {(r["query_id"], r["rank"]): (r["id"], r["score"]) for r in b.collect()}
    assert pa.keys() == pb.keys()  # every query answered in exactly one chunk
    for key in pa:
        assert pa[key][0] == pb[key][0]
        assert pa[key][1] == pytest.approx(pb[key][1], abs=1e-9)


def test_chunked_single_chunk_delegates_to_blocked(spark, vectors, queries):
    from mlx_vector_db_spark.operators.knn import knn_join_chunked

    a = knn_join_blocked(vectors, queries, k=K)
    b = knn_join_chunked(vectors, queries, k=K, chunk_size=1000)
    assert sorted((r["query_id"], r["rank"], r["id"]) for r in a.collect()) == sorted(
        (r["query_id"], r["rank"], r["id"]) for r in b.collect()
    )


def test_chunked_empty_queries_raises(spark, vectors, queries):
    from mlx_vector_db_spark.operators.knn import knn_join_chunked

    with pytest.raises(ValueError, match="empty query set"):
        knn_join_chunked(vectors, queries.where("query_id < 0"), k=K)


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot_product"])
def test_query_blocked_path_parity(spark, vectors, queries, metric):
    """block_side="queries" (vector matrix broadcast, query-partitioned,
    fp32 select + fp64 re-score, in-batch rank, no shuffle) must be
    bit-comparable to the expression path — ids exact, scores to 1e-9."""
    a = knn_join(vectors, queries, k=K, metric=metric)
    b = knn_join_blocked(
        vectors, queries, k=K, metric=metric, block_side="queries"
    )
    pa = {(r["query_id"], r["rank"]): (r["id"], r["score"]) for r in a.collect()}
    pb = {(r["query_id"], r["rank"]): (r["id"], r["score"]) for r in b.collect()}
    assert pa.keys() == pb.keys()
    for key in pa:
        assert pa[key][0] == pb[key][0]
        assert pa[key][1] == pytest.approx(pb[key][1], abs=1e-9)


def test_query_blocked_wide_batch_parity(spark):
    """A query batch wide enough for several Arrow batches + the margin
    net actually pruning (N >> k), with planted exact ties straddling
    the k frontier in every metric."""
    rng = np.random.default_rng(9)
    n, m, d, k = 400, 150, 12, 5
    V = rng.standard_normal((n, d)).astype(np.float32)
    V[50] = V[51]
    V[52] = V[51]  # triple tie
    Q = rng.standard_normal((m, d)).astype(np.float32)
    Q[7] = V[51]  # self-query lands the tie group at rank 1..3
    vectors = spark.createDataFrame(
        [(i, V[i].tolist()) for i in range(n)], "id long, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(i, Q[i].tolist()) for i in range(m)],
        "query_id long, embedding array<float>",
    ).repartition(6)
    for metric in ("cosine", "euclidean", "dot_product"):
        a = knn_join(vectors, queries, k=k, metric=metric)
        b = knn_join_blocked(
            vectors, queries, k=k, metric=metric, block_side="queries"
        )
        pa = {(r["query_id"], r["rank"]): (r["id"], r["score"]) for r in a.collect()}
        pb = {(r["query_id"], r["rank"]): (r["id"], r["score"]) for r in b.collect()}
        assert pa.keys() == pb.keys(), metric
        for key in pa:
            assert pa[key][0] == pb[key][0], (metric, key)
            assert pa[key][1] == pytest.approx(pb[key][1], abs=1e-9), (metric, key)


def test_query_blocked_keeps_ties_and_filter(spark, vectors, queries, vec_np, queries_np):
    """Metadata pre-filter semantics hold on the query-blocked path
    (filter applies before the vector matrix is collected)."""
    got = knn_join_blocked(
        vectors, queries, k=K, metric="cosine",
        filter_metadata={"category": "A"}, block_side="queries",
    ).collect()
    mask = np.array([i % 2 == 0 for i in range(N)])
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid in range(NQ):
        rows = sorted(by_q[qid], key=lambda r: r["rank"])
        exp_ids, exp_scores = oracle_topk(vec_np, queries_np[qid], "cosine", K, mask=mask)
        assert [r["id"] for r in rows] == exp_ids
        for r, s in zip(rows, exp_scores):
            assert r["score"] == pytest.approx(s, abs=1e-6)


def test_blocked_auto_dispatch(spark, vectors):
    """auto flips to the query-blocked (map-only, shuffle-free) plan
    exactly when M >= QBLOCK_MIN_QUERIES and the fp32 vector matrix
    fits the broadcast budget — visible as the absence of an Exchange
    in the executed plan."""
    from mlx_vector_db_spark.operators.knn import QBLOCK_MIN_QUERIES

    rng = np.random.default_rng(3)
    big_q = spark.createDataFrame(
        [(i, rng.random(DIM).astype(np.float32).tolist()) for i in range(QBLOCK_MIN_QUERIES)],
        "query_id long, embedding array<float>",
    )
    wide = knn_join_blocked(vectors, big_q, k=3)
    plan = wide._jdf.queryExecution().executedPlan().toString()
    # no per-query window and no hash-partitioned candidate shuffle —
    # the only Exchange the query-blocked plan may carry is the
    # round-robin rebalance of an under-partitioned query scan
    assert "Window" not in plan
    assert "hashpartitioning" not in plan
    small_q = big_q.where(F.col("query_id") < 5)
    narrow = knn_join_blocked(vectors, small_q, k=3)
    plan2 = narrow._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan2 or "Window" in plan2


def test_blocked_keeps_score_ties_at_k_boundary(spark):
    """With duplicate vectors the per-batch partial top-k must keep ALL
    score-ties at the k frontier, so the canonical (score, id ASC) order
    — not argpartition's arbitrary internal order — picks the winners."""
    from mlx_vector_db_spark.operators.knn import knn_join_blocked

    dup = [1.0, 0.0, 0.0, 0.0]
    rows = [(i, dup) for i in range(100)]  # every row ties on any metric
    vectors = spark.createDataFrame(
        rows, "id long, embedding array<float>"
    ).repartition(8)  # several Arrow batches, each full of ties
    queries = spark.createDataFrame([(0, dup)], "query_id long, embedding array<float>")
    for metric in ("cosine", "dot_product", "euclidean"):
        got = [
            r["id"]
            for r in knn_join_blocked(vectors, queries, k=5, metric=metric)
            .orderBy("rank")
            .collect()
        ]
        assert got == [0, 1, 2, 3, 4], metric


def test_chunked_caches_released(spark, sf_small):
    """knn_join_chunked must not pin caches across calls: the query-side
    cache dies at plan build, the vectors cache retires with the
    returned DataFrame and is reclaimed by release_intermediates (or
    FIFO eviction) — a batch loop accumulates a bounded set, a drain
    releases everything."""
    import gc

    from mlx_vector_db_spark import release_intermediates
    from mlx_vector_db_spark.operators.knn import knn_join_chunked

    jsc = spark.sparkContext._jsc.sc()

    def n_cached():
        return len([i for i in jsc.getRDDStorageInfo()])

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    queries = emb.where("vec_id < 20").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = n_cached()
    out = knn_join_chunked(
        emb, queries, k=3, vec_col="embedding", id_col="vec_id", chunk_size=7
    )
    assert out.count() == 60
    del out
    gc.collect()
    release_intermediates(spark)
    assert n_cached() <= before


def test_chunked_cache_survives_derived_frame(spark, sf_small):
    """A caller that derives a frame and drops the original before
    executing (`return out.select(...)`) must still execute against a
    LIVE vectors cache — the r5 finalizer unpersisted it at GC time,
    silently defeating cache_vectors (ADVICE r5)."""
    import gc

    from mlx_vector_db_spark import release_intermediates
    from mlx_vector_db_spark.operators import knn as K

    release_intermediates(spark)  # start from a drained registry
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    queries = emb.where("vec_id < 20").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = K.knn_join_chunked(
        emb, queries, k=3, vec_col="embedding", id_col="vec_id", chunk_size=7
    )
    derived = out.select("query_id", "vec_id", "rank")
    del out
    gc.collect()
    # the cache retired but was NOT unpersisted: execution hits it
    assert len(K._RETIRED_VECTOR_CACHES) == 1
    cached = K._RETIRED_VECTOR_CACHES[0]
    assert cached.storageLevel.useMemory
    assert derived.count() == 60
    release_intermediates(spark)
    assert not K._RETIRED_VECTOR_CACHES
    assert not cached.storageLevel.useMemory


# ---------------------------------------------------------------------------
# r10: NULL-vector parity, bounded auto probe, per-entry frontier margins
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def null_vectors(spark, vec_np):
    """vectors table with a NULL embedding planted mid-table."""
    rows = [
        (i, None if i == 13 else vec_np[i].tolist()) for i in range(N)
    ]
    return spark.createDataFrame(rows, "id long, embedding array<float>")


@pytest.mark.parametrize("metric", ["cosine", "euclidean", "dot_product"])
def test_null_vector_parity_all_strategies(spark, null_vectors, queries, metric):
    """Engine-wide NULL rule (VERDICT r9 #1): a NULL embedding row is
    excluded in EVERY strategy — the r9 blocked paths crashed on it
    (np.asarray inhomogeneous shape) while the expression path's NULL
    scores sorted last for cosine but FIRST for euclidean."""
    from mlx_vector_db_spark.operators.knn import knn_join_chunked

    results = {
        "expr": knn_join(null_vectors, queries, k=K, metric=metric),
        "vblk": knn_join_blocked(
            null_vectors, queries, k=K, metric=metric, block_side="vectors"
        ),
        "qblk": knn_join_blocked(
            null_vectors, queries, k=K, metric=metric, block_side="queries"
        ),
        "chunk": knn_join_chunked(
            null_vectors, queries, k=K, metric=metric, chunk_size=3
        ),
    }
    collected = {
        name: {(r["query_id"], r["rank"]): (r["id"], r["score"])
               for r in df.collect()}
        for name, df in results.items()
    }
    base = collected["expr"]
    assert base, "expression path returned nothing"
    assert all(vid != 13 for vid, _ in base.values())  # NULL row excluded
    for name, got in collected.items():
        assert got.keys() == base.keys(), name
        for key in base:
            assert got[key][0] == base[key][0], (name, key)
            assert got[key][1] == pytest.approx(base[key][1], abs=1e-9), (name, key)


def test_null_query_vectors_excluded(spark, vectors, queries_np):
    """A query row with a NULL vector produces no output rows, in every
    strategy."""
    from mlx_vector_db_spark.operators.knn import knn_join_chunked

    rows = [(i, None if i == 2 else queries_np[i].tolist()) for i in range(NQ)]
    nullq = spark.createDataFrame(rows, "query_id long, embedding array<float>")
    for df in (
        knn_join(vectors, nullq, k=3),
        knn_join_blocked(vectors, nullq, k=3, block_side="vectors"),
        knn_join_blocked(vectors, nullq, k=3, block_side="queries"),
        knn_join_chunked(vectors, nullq, k=3, chunk_size=3),
    ):
        qids = {r["query_id"] for r in df.collect()}
        assert qids == set(range(NQ)) - {2}


def test_vector_size_probe_is_limit_bounded(spark, vectors):
    """The auto-dispatch vector probe must never pay a full count: with
    a budget smaller than the table, the bounded count stops at
    budget_rows + 1 (VERDICT r9 #2)."""
    from mlx_vector_db_spark.operators import knn as KN

    KN._SIZE_CACHE.clear()
    # budget of exactly 10 rows of DIM fp32
    n, dim, budget_rows = KN._vector_matrix_size(
        vectors.select("id", "embedding"), "embedding", 10 * DIM * 4
    )
    assert dim == DIM
    assert budget_rows == 10
    assert n == budget_rows + 1  # early-exit: not the true 200-row count
    # over budget -> auto stays vector-blocked; under budget -> exact count
    KN._SIZE_CACHE.clear()
    n2, _, budget2 = KN._vector_matrix_size(
        vectors.select("id", "embedding"), "embedding", 4 * N * DIM * 4
    )
    assert n2 == N and n2 <= budget2
    KN._SIZE_CACHE.clear()


def test_frontier_mask_per_entry_margin_mixed_norms():
    """Pure-numpy soundness + tightness of the per-entry error net
    (VERDICT r9 #6): on a mixed-norm corpus the net must catch every
    true top-k member while staying ~k wide — the old global-vmax
    margin made every query pay for the single largest vector norm."""
    from mlx_vector_db_spark.operators.knn import (
        _F32_EPS,
        _entry_error_bound,
        _frontier_mask,
    )

    rng = np.random.default_rng(7)
    n, m, d, k = 5000, 64, 32, 10
    V = rng.standard_normal((n, d))
    V[:100] *= 1000.0  # hundred huge-norm rows dominate vmax
    V[100:200] *= 1e-2
    Q = rng.standard_normal((m, d))
    S64 = Q @ V.T
    S32 = Q.astype(np.float32) @ np.ascontiguousarray(V.astype(np.float32).T)
    q_norms = np.linalg.norm(Q, axis=1)
    v_norms32 = np.linalg.norm(V, axis=1).astype(np.float32)
    E = _entry_error_bound("dot_product", d, q_norms, v_norms32)
    assert E.shape == (m, n)
    mask = _frontier_mask(S32, E, k, ascending=False)
    # soundness: every true top-k member caught
    true_topk = np.argsort(-S64, axis=1)[:, :k]
    for i in range(m):
        assert mask[i, true_topk[i]].all(), i
    # tightness: the net stays near k per query, NOT inflated to the
    # huge-norm rows' scale (global-vmax margin caught 100x more here)
    per_query = mask.sum(axis=1)
    assert per_query.max() <= 4 * k, per_query.max()
    # the old global margin for comparison: provably wider on this corpus
    vmax = float(np.linalg.norm(V, axis=1).max())
    bound = np.partition(S32, n - k, axis=1)[:, n - k]
    old_margin = 4.0 * d * _F32_EPS * q_norms * vmax
    old_net = (S32 >= (bound - old_margin)[:, None]).sum(axis=1)
    assert per_query.sum() <= old_net.sum()


@pytest.mark.parametrize("metric", ["dot_product", "euclidean"])
def test_mixed_norm_parity_query_blocked(spark, metric):
    """End-to-end parity on a mixed-norm corpus (norms spanning 1e-2 to
    1e3) — the regime the per-entry margins were tightened for."""
    rng = np.random.default_rng(11)
    n, m, d, k = 600, 40, 16, 7
    V = rng.standard_normal((n, d)).astype(np.float32)
    V[:20] *= 1000.0
    V[20:40] *= 0.01
    Q = rng.standard_normal((m, d)).astype(np.float32)
    Q[:5] *= 500.0
    vectors = spark.createDataFrame(
        [(i, V[i].tolist()) for i in range(n)], "id long, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(i, Q[i].tolist()) for i in range(m)],
        "query_id long, embedding array<float>",
    ).repartition(4)
    a = knn_join(vectors, queries, k=k, metric=metric)
    b = knn_join_blocked(vectors, queries, k=k, metric=metric, block_side="queries")
    pa = {(r["query_id"], r["rank"]): (r["id"], r["score"]) for r in a.collect()}
    pb = {(r["query_id"], r["rank"]): (r["id"], r["score"]) for r in b.collect()}
    assert pa.keys() == pb.keys()
    for key in pa:
        assert pa[key][0] == pb[key][0], key
        assert pa[key][1] == pytest.approx(pb[key][1], rel=1e-9, abs=1e-9), key


def test_query_blocked_non_lossless_auto_falls_back(spark, vectors):
    """Auto dispatch budget-checks fp32 bytes; a matrix that is NOT
    fp32-lossless would ship 2x that as float64 — auto must fall back
    to the vector-blocked plan (ADVICE r9). Explicit block_side
    ships fp64 as asked."""
    from mlx_vector_db_spark.operators.knn import _knn_join_query_blocked

    # 1/3 is not exactly representable in fp32 *or* fp64, but the fp64
    # literal does not round-trip through fp32
    rows = [(i, [1.0 / 3.0 + i, 0.1]) for i in range(8)]
    v64 = spark.createDataFrame(rows, "id long, embedding array<double>")
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, embedding array<double>")
    assert (
        _knn_join_query_blocked(
            v64, q, 3, "cosine", "embedding", "id", "embedding", "query_id",
            max_rows=100,
        )
        is None
    )
    # explicit call still works, fp64 payload
    out = _knn_join_query_blocked(
        v64, q, 3, "cosine", "embedding", "id", "embedding", "query_id"
    )
    assert out is not None and out.count() == 3


def test_blocked_broadcasts_are_registered_and_drained(spark, vectors, queries):
    """Matrix broadcasts retire through the bounded registry so bench
    reps / long sessions don't accumulate executor copies (ADVICE r9)."""
    from mlx_vector_db_spark import release_intermediates
    from mlx_vector_db_spark.operators import knn as KN

    release_intermediates(spark)
    assert not KN._LIVE_BROADCASTS
    knn_join_blocked(vectors, queries, k=3, block_side="queries").count()
    knn_join_blocked(vectors, queries, k=3, block_side="vectors").count()
    assert len(KN._LIVE_BROADCASTS) == 2
    for _ in range(KN._BROADCAST_MAX + 2):  # FIFO eviction keeps it bounded
        KN._register_broadcast(spark.sparkContext.broadcast(1))
    assert len(KN._LIVE_BROADCASTS) == KN._BROADCAST_MAX
    release_intermediates(spark)
    assert not KN._LIVE_BROADCASTS


def test_store_mutation_invalidates_sizing_caches(spark, tmp_path):
    """Every store mutation funnels through _commit_manifest, which must
    drop the plan-fingerprint sizing memos: the file set just changed
    under plans whose analyzed fingerprint is unchanged (ADVICE r9)."""
    from mlx_vector_db_spark import rebalance as RB
    from mlx_vector_db_spark.operators import knn as KN
    from mlx_vector_db_spark.store import VectorStoreCatalog

    cat = VectorStoreCatalog(spark, tmp_path / "s")
    st = cat.create_store("u", "m", dimension=4)
    KN._SIZE_CACHE[("app", 1)] = (5, 4, 100)
    RB._PROBE_CACHE[("app", 1, 32)] = True
    st.add_vectors([[0.1, 0.2, 0.3, 0.4]] * 4, [{} for _ in range(4)])
    assert not KN._SIZE_CACHE
    assert not RB._PROBE_CACHE


def test_null_element_vectors_excluded_all_strategies(spark, vec_np, queries):
    """A vector CONTAINING a NULL element follows the same exclusion
    rule as a whole-NULL vector — the expression path would otherwise
    rank its NULL score first under euclidean's ascending order while
    the workers silently coerce None to NaN."""
    from mlx_vector_db_spark.operators.knn import knn_join_chunked

    rows = []
    for i in range(N):
        vec = vec_np[i].tolist()
        if i == 21:
            vec[3] = None  # planted NULL element
        rows.append((i, vec))
    vectors = spark.createDataFrame(rows, "id long, embedding array<float>")
    base = None
    for name, df in (
        ("expr", knn_join(vectors, queries, k=K, metric="euclidean")),
        ("vblk", knn_join_blocked(vectors, queries, k=K, metric="euclidean",
                                  block_side="vectors")),
        ("qblk", knn_join_blocked(vectors, queries, k=K, metric="euclidean",
                                  block_side="queries")),
        ("chunk", knn_join_chunked(vectors, queries, k=K, metric="euclidean",
                                   chunk_size=3)),
    ):
        got = {(r["query_id"], r["rank"]): (r["id"], r["score"]) for r in df.collect()}
        assert all(vid != 21 for vid, _ in got.values()), name
        if base is None:
            base = got
            continue
        assert got.keys() == base.keys(), name
        for key in base:
            assert got[key][0] == base[key][0], (name, key)
            assert got[key][1] == pytest.approx(base[key][1], abs=1e-9), (name, key)


def test_store_rejects_non_finite_vectors(spark, tmp_path):
    """Both ingest paths enforce the finiteness contract the read-side
    operators rely on: wire-format lists in the driver-side walk,
    DataFrames in the single count+validate aggregation (where a NULL
    embedding would otherwise slip past size(NULL) = NULL)."""
    from mlx_vector_db_spark.store import VectorStoreCatalog

    cat = VectorStoreCatalog(spark, tmp_path / "s")
    st = cat.create_store("u", "m", dimension=3)
    with pytest.raises(ValueError, match="finite"):
        st.add_vectors([[1.0, float("nan"), 0.0]], [{}])
    with pytest.raises(ValueError, match="finite"):
        st.add_vectors([[1.0, float("inf"), 0.0]], [{}])
    df_nan = spark.createDataFrame(
        [(0, [1.0, None, 0.0])], "id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="finite"):
        st.add_vectors(df_nan)
    df_null = spark.createDataFrame(
        [(1, None)], "id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="dimension"):
        st.add_vectors(df_null)
    st.add_vectors([[1.0, 2.0, 3.0]], [{}])  # clean rows still land
    assert st.count() == 1


def test_expr_delegates_medium_batches_to_blocked(spark, vectors):
    """knn_join is the expression path below EXPR_MAX_QUERIES (or on a
    vectors table below the amortization floor) and the Arrow BLAS path
    above both (measured 7x at 100 x 200k); results are identical
    either way (the blocked strategies are parity-gated)."""
    from mlx_vector_db_spark.operators.knn import (
        EXPR_MAX_QUERIES,
        EXPR_MIN_VECTOR_ROWS_FOR_BLOCKED,
        knn_join,
    )

    # deterministic JVM-generated table above the vectors-side floor
    big_vec = spark.range(EXPR_MIN_VECTOR_ROWS_FOR_BLOCKED + 8_000).select(
        "id",
        F.expr(
            "transform(sequence(1, 8),"
            " j -> cast(pmod(id * j, 97) / 97.0 as float))"
        ).alias("embedding"),
    )
    small_q = big_vec.limit(8).select(F.col("id").alias("query_id"), "embedding")
    big_q = big_vec.limit(EXPR_MAX_QUERIES + 16).select(
        F.col("id").alias("query_id"), "embedding"
    )
    small_plan = knn_join(big_vec, small_q, k=3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in small_plan
    big = knn_join(big_vec, big_q, k=3)
    big_plan = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in big_plan
    # identical results through the delegated path
    expr = knn_join(big_vec, big_q, k=3, allow_blocked=False)
    a = [(r["query_id"], r["id"]) for r in big.orderBy("query_id", "rank").collect()]
    e = [(r["query_id"], r["id"]) for r in expr.orderBy("query_id", "rank").collect()]
    assert a == e
    # a SMALL vectors table keeps the expression plan even past the
    # query threshold (the blocked fixed costs don't amortize)
    small_vec_q = vectors.limit(EXPR_MAX_QUERIES + 16).select(
        F.col("id").alias("query_id"), "embedding"
    )
    small_vec_plan = knn_join(vectors, small_vec_q, k=3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in small_vec_plan
    # broadcast_queries=False is an explicit opt-out (queries don't fit
    # the driver) and must keep the expression plan
    opt_out = knn_join(big_vec, big_q, k=3, broadcast_queries=False)
    assert "mapInPandas" not in opt_out._jdf.queryExecution(
    ).executedPlan().toString().replace("MapInPandas", "mapInPandas")


# ---------------------------------------------------------------------------
# r11: qcount cache bound key, dtype-stable delegation gate
# ---------------------------------------------------------------------------


def test_qcount_cache_key_includes_bound(spark, vectors):
    """VERDICT r10 #3: the same analyzed plan probed at two bounds must
    NOT share a cache slot — a count truncated at a small bound would
    otherwise answer the large-bound question and misroute the path."""
    from mlx_vector_db_spark.operators import knn as K

    df = spark.range(500).select(
        F.col("id"), F.array(F.lit(1.0), F.lit(2.0)).alias("embedding")
    )
    K._QCOUNT_CACHE.clear()
    small = K._bounded_query_count(df, 8)
    big = K._bounded_query_count(df, 1000)
    assert small == 9          # truncated at bound + 1
    assert big == 500          # the SAME plan, full answer at the big bound
    assert len(K._QCOUNT_CACHE) == 2
    # and the memo answers repeats without re-running jobs
    assert K._bounded_query_count(df, 8) == 9


def test_delegation_requires_long_ids(spark):
    """ADVICE r10 (medium): the blocked path emits long id columns, so
    auto-delegation must only fire when both id columns already are
    LongType — otherwise knn_join's output dtype would depend on the
    data size. Non-long ids keep the expression plan and their dtype."""
    from pyspark.sql.types import IntegerType

    from mlx_vector_db_spark.operators.knn import (
        EXPR_MAX_QUERIES,
        EXPR_MIN_VECTOR_ROWS_FOR_BLOCKED,
        knn_join,
    )

    big_vec = spark.range(EXPR_MIN_VECTOR_ROWS_FOR_BLOCKED + 8_000).select(
        F.col("id").cast("int").alias("id"),
        F.expr(
            "transform(sequence(1, 8),"
            " j -> cast(pmod(id * j, 97) / 97.0 as float))"
        ).alias("embedding"),
    )
    big_q = big_vec.limit(EXPR_MAX_QUERIES + 16).select(
        F.col("id").alias("query_id"), "embedding"
    )
    out = knn_join(big_vec, big_q, k=3)
    # int ids: expression plan retained, output id dtypes preserved
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert isinstance(out.schema["id"].dataType, IntegerType)
    assert isinstance(out.schema["query_id"].dataType, IntegerType)


def test_row_group_starvation_probe(spark, tmp_path):
    """r12: a parquet scan can plan >= target SPLITS while owning fewer
    ROW GROUPS than target (fat single-row-group files) — byte-range
    splits collapse onto the row-group owners and the compute runs
    few-way. The probe reads footers driver-side and flags it; a table
    written with bounded row groups passes."""
    import pyspark.sql.functions as SF

    from mlx_vector_db_spark.rebalance import (
        _row_group_starved,
        rebalance_for_compute,
    )

    df = spark.range(40_000).select(
        SF.col("id"), SF.lpad(SF.lit("x"), 200, "y").alias("pad")
    )
    fat = str(tmp_path / "fat")
    # one file, one huge row group
    df.coalesce(1).write.option(
        "parquet.block.size", 512 * 1024 * 1024
    ).parquet(fat)
    fat_df = spark.read.parquet(fat)
    assert _row_group_starved(fat_df, 8) is True
    # rebalance now spreads it to defaultParallelism despite whatever
    # split count was planned (the test session runs local[4])
    target = spark.sparkContext.defaultParallelism
    parts = (
        rebalance_for_compute(fat_df)
        .groupBy(SF.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    n = {r["p"]: r["count"] for r in parts}
    assert len(n) == target
    assert max(n.values()) < 40_000  # no single task owns everything
    # bounded row groups -> not starved
    thin = str(tmp_path / "thin")
    df.coalesce(1).write.option("parquet.block.size", 64 * 1024).parquet(thin)
    assert _row_group_starved(spark.read.parquet(thin), 8) is False
    # non-file plans are a safe no
    assert _row_group_starved(spark.range(10), 8) is False
