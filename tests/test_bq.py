"""Binary quantization: threshold training, Arrow encode (packed sign
bits), Hamming candidate scan + exact re-rank vs the exact kNN oracle,
full-overfetch exactness, serialization roundtrip, NULL handling.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.bq import BQModel, bq_search_batch, train_bq
from mlx_vector_db_spark.operators.knn import knn_join

N, DIM, K = 2000, 32, 10
RNG = np.random.default_rng(41)


@pytest.fixture(scope="module")
def vec_np():
    # clustered mixture (the regime where sign bits carry real signal):
    # centers spread around the origin after mean-centering
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
def bq(vectors):
    return train_bq(vectors, seed=7)


@pytest.fixture(scope="module")
def coded(vectors, bq):
    return bq.encode(vectors).cache()


@pytest.fixture(scope="module")
def queries(coded):
    return coded.where(F.col("id") < 5).select(
        F.col("id").alias("query_id"), "embedding"
    )


def test_codes_shape_and_compression(coded, bq):
    assert bq.dim == DIM
    assert bq.code_bytes == DIM // 8
    assert bq.compression == 32.0
    row = coded.first()
    assert isinstance(row["bq_code"], (bytes, bytearray))
    assert len(row["bq_code"]) == DIM // 8
    assert coded.count() == N


def test_pack_matches_numpy_oracle(bq, vec_np, coded):
    """The distributed Arrow encode must agree bit-for-bit with the
    driver-side pack (same thresholds, same packbits order)."""
    rows = coded.where(F.col("id") < 50).orderBy("id").collect()
    got = np.frombuffer(
        b"".join(r["bq_code"] for r in rows), dtype=np.uint8
    ).reshape(50, bq.code_bytes)
    want = bq.pack(vec_np[:50].astype(np.float64))
    assert np.array_equal(got, want)


def test_thresholds_are_column_means(bq, vec_np):
    np.testing.assert_allclose(
        bq.thresholds, vec_np.astype(np.float64).mean(axis=0), rtol=1e-6
    )


def test_serialization_roundtrip(bq, vec_np):
    clone = BQModel.from_dict(bq.to_dict())
    assert np.array_equal(clone.pack(vec_np[:20]), bq.pack(vec_np[:20]))
    assert clone.vec_col == bq.vec_col
    with pytest.raises(ValueError):
        BQModel.from_dict({"kind": "ivf"})


def test_recall_vs_exact(coded, queries, bq, vectors):
    """Hamming candidates + exact re-rank: recall@10 >= 0.9 per query.

    overfetch=32 here: this fixture has only 8 wide clusters of ~250
    rows, so the top-10 lives INSIDE a cluster where 32-bit Hamming has
    little resolution — the hardest regime (measured: overfetch 8 ->
    8/10 worst query, 16 -> 8/10, 32 -> 10/10). The fine-clustered
    64-bit gate regime reaches full recall at overfetch=2-4
    (queries.py bq_clustered_recall_gate)."""
    approx = bq_search_batch(
        coded, queries, bq, k=K, overfetch=32, delegate_saturation=None
    ).collect()
    exact = knn_join(vectors, queries, k=K).collect()
    want = {}
    for r in exact:
        want.setdefault(r["query_id"], set()).add(r["id"])
    got = {}
    for r in approx:
        got.setdefault(r["query_id"], set()).add(r["id"])
    assert set(got) == set(want)
    for qid in want:
        assert len(got[qid] & want[qid]) >= 9, f"recall@10 < 0.9 for {qid}"


def test_full_overfetch_is_exact(coded, queries, bq, vectors):
    """With the candidate set covering the whole corpus the two-pass
    result must EQUAL the exact kNN (same ids, same order) — the
    re-rank stage introduces no error of its own."""
    approx = bq_search_batch(
        coded, queries, bq, k=K, overfetch=(N + K - 1) // K,
        delegate_saturation=None,
    )
    exact = knn_join(vectors, queries, k=K)
    a = [(r["query_id"], r["id"]) for r in approx.orderBy("query_id", "rank").collect()]
    e = [(r["query_id"], r["id"]) for r in exact.orderBy("query_id", "rank").collect()]
    assert a == e


def test_no_rerank_returns_hamming(coded, queries, bq):
    out = bq_search_batch(coded, queries, bq, k=K, exact_rerank=False)
    assert set(out.columns) == {"query_id", "id", "hamming"}
    rows = out.collect()
    assert len(rows) == 5 * K * 8  # k * overfetch per query
    assert all(r["hamming"] >= 0 for r in rows)
    # each query's own code is at Hamming distance 0 of itself
    self_rows = [r for r in rows if r["query_id"] == r["id"]]
    assert len(self_rows) == 5 and all(r["hamming"] == 0 for r in self_rows)


def test_encode_rejects_null_vectors(spark, bq):
    df = spark.createDataFrame(
        [(0, [0.5] * DIM), (1, None)], "id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="NULL"):
        bq.encode(df).collect()


def test_train_empty_raises(spark):
    empty = spark.createDataFrame([], "id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        train_bq(empty)


def test_metric_validation(coded, queries, bq):
    with pytest.raises(ValueError, match="unknown metric"):
        bq_search_batch(coded, queries, bq, metric="manhattan")


def test_tune_overfetch_bq(coded, queries, bq):
    """The tuner returns the smallest tried rung clearing the target,
    with the measured curve; on this hard wide-cluster fixture the
    knee sits at 32 (the recall test's measured curve)."""
    from mlx_vector_db_spark.operators.bq import tune_overfetch_bq

    chosen, curve = tune_overfetch_bq(
        coded, queries, bq, k=K, target_recall=0.9
    )
    assert curve[chosen] >= 0.9
    assert all(v < 0.9 for c, v in curve.items() if c < chosen)
    # the curve is monotone-ish towards the knee: the chosen rung beats
    # the smallest tried rung
    assert curve[chosen] >= curve[min(curve)]


def test_tune_overfetch_bq_validation(coded, queries, bq):
    from mlx_vector_db_spark.operators.bq import tune_overfetch_bq

    with pytest.raises(ValueError, match="target_recall"):
        tune_overfetch_bq(coded, queries, bq, target_recall=0.0)
    empty_q = queries.where("query_id < 0")
    with pytest.raises(ValueError, match="empty query"):
        tune_overfetch_bq(coded, empty_q, bq)


def test_bq_composes_with_ivf_cells(spark, vectors, vec_np):
    """IVF-BQ by composition: cell-prune to the query's probe set, then
    the Hamming scan + exact re-rank run on the pruned frame — the
    operator takes any DataFrame, so the ladder composes with cell
    pruning with no dedicated kernel (the IVF-PQ story at zero
    training). Recall vs the exact scan holds on the pruned cells'
    candidate pool with the probe set covering every cell."""
    from mlx_vector_db_spark.operators.ann import build_ivf

    indexed, ivf = build_ivf(vectors, nlist=4, seed=3, max_iter=6)
    bq = train_bq(indexed, seed=3)
    coded = bq.encode(indexed).cache()
    queries = coded.where(F.col("id") < 3).select(
        F.col("id").alias("query_id"), "embedding"
    )
    # full probe set == no pruning: composition must equal plain BQ
    probes_all = list(range(4))
    pruned = coded.where(F.col("centroid_id").isin(probes_all))
    via_cells = bq_search_batch(
        pruned.drop("centroid_id"), queries, bq, k=K, overfetch=32,
        delegate_saturation=None,
    )
    plain = bq_search_batch(
        coded.drop("centroid_id"), queries, bq, k=K, overfetch=32,
        delegate_saturation=None,
    )
    a = [(r["query_id"], r["id"]) for r in via_cells.orderBy("query_id", "rank").collect()]
    b = [(r["query_id"], r["id"]) for r in plain.orderBy("query_id", "rank").collect()]
    assert a == b
    # real pruning: each query's own cell retains its self-match at rank 1
    q0 = vec_np[0].astype(np.float64)
    probe = ivf.probes_for(q0, 1)
    one_cell = coded.where(F.col("centroid_id").isin(probe)).drop("centroid_id")
    hit = bq_search_batch(
        one_cell, queries.where(F.col("query_id") == 0), bq, k=1, overfetch=8
    ).first()
    assert hit["id"] == 0 and hit["rank"] == 1


# ---------------------------------------------------------------------------
# r11: NULL-query parity, SWAR popcount exactness, sliced-kernel parity
# ---------------------------------------------------------------------------


def test_popcount64_matches_lut():
    """The SWAR sideways-addition popcount is bit-exact against the
    256-entry LUT on random words (including all-ones / zero edges)."""
    from mlx_vector_db_spark.operators.bq import _POPCNT, _popcount64

    rng = np.random.default_rng(11)
    words = rng.integers(0, 2**64, size=4096, dtype=np.uint64)
    words[:2] = [0, 0xFFFFFFFFFFFFFFFF]
    want = _POPCNT[words.view(np.uint8).reshape(-1, 8)].sum(axis=1)
    got = _popcount64(words)
    assert np.array_equal(got.astype(np.int64), want.astype(np.int64))


def test_hamming_pass_exact_vs_numpy(spark):
    """Hamming is integer math — the sliced/per-task-reduced kernel must
    be EXACTLY the brute-force distance, on a dim that does NOT divide
    by 8 (exercises the zero-pad word packing) and with take >= n (the
    keep-all branch)."""
    dim, n = 20, 300
    rng = np.random.default_rng(5)
    X = rng.random((n, dim)).astype(np.float64)
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(n)],
        "id long, embedding array<double>",
    )
    model = train_bq(df, max_train_rows=n)
    assert model.code_bytes == 3  # 20 bits -> 3 bytes: pad path live
    coded_df = model.encode(df)
    qs = df.where(F.col("id") < 4).select(
        F.col("id").alias("query_id"), "embedding"
    )
    out = bq_search_batch(
        coded_df, qs, model, k=n, overfetch=1, exact_rerank=False
    ).collect()
    codes = np.unpackbits(model.pack(X), axis=1)[:, :dim]
    for r in out:
        want = int(np.sum(codes[r["query_id"]] != codes[r["id"]]))
        assert r["hamming"] == want, (r["query_id"], r["id"])
    assert len(out) == 4 * n  # every pair emitted under take >= n


def test_hamming_small_take_matches_global_topk(spark, coded, queries, bq, vectors):
    """With take << n the per-batch boundary-tie keep + per-task exact
    cut must equal a single global (hamming, id ASC) sort — verified
    against the driver-side numpy oracle."""
    take = 2 * K  # k * overfetch
    out = bq_search_batch(
        coded, queries, bq, k=K, overfetch=2, exact_rerank=False
    ).collect()
    rows = vectors.orderBy("id").collect()
    X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.asarray([r["id"] for r in rows])
    bits = np.unpackbits(bq.pack(X), axis=1)[:, :DIM]
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["hamming"], r["id"]))
    for qid, pairs in got.items():
        d = (bits != bits[list(ids).index(qid)]).sum(axis=1)
        order = np.lexsort((ids, d))[:take]
        want = sorted((int(d[i]), int(ids[i])) for i in order)
        assert sorted(pairs) == want, qid


def test_bq_null_query_parity(spark, coded, bq, vec_np):
    """VERDICT r10 #1: a NULL query vector (or NULL element) is excluded
    by bq_search_batch exactly as every kNN strategy excludes it — no
    crash, no rows for the NULL query, other queries unaffected."""
    rows = [
        (0, vec_np[0].tolist()),
        (1, None),
        (2, vec_np[2].tolist()),
        (3, [None if j == 5 else float(vec_np[3][j]) for j in range(DIM)]),
    ]
    nullq = spark.createDataFrame(rows, "query_id long, embedding array<float>")
    out = bq_search_batch(
        coded, nullq, bq, k=K, overfetch=32, delegate_saturation=None
    )
    qids = {r["query_id"] for r in out.collect()}
    assert qids == {0, 2}
    ref = knn_join(coded.drop("bq_code"), nullq, k=K)
    assert {r["query_id"] for r in ref.collect()} == qids
    # the no-rerank surface obeys the same rule
    ham = bq_search_batch(coded, nullq, bq, k=K, exact_rerank=False)
    assert {r["query_id"] for r in ham.collect()} == {0, 2}
    # all-NULL query set -> the explicit empty-set error, not a crash
    allnull = spark.createDataFrame(
        [(0, None)], "query_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="empty query"):
        bq_search_batch(coded, allnull, bq, k=K)


def test_tune_overfetch_bq_null_queries(coded, queries, bq, spark):
    """tune_overfetch_bq inherits the NULL rule instead of the crash."""
    from mlx_vector_db_spark.operators.bq import tune_overfetch_bq

    nullq = queries.union(
        spark.createDataFrame(
            [(99, None)], "query_id long, embedding array<float>"
        )
    )
    chosen, curve = tune_overfetch_bq(
        coded, nullq, bq, k=K, target_recall=0.5, candidates=[32]
    )
    assert chosen == 32 and 0.0 <= curve[32] <= 1.0


def test_train_bq_ignores_null_vectors(spark, vec_np):
    """ADVICE r10: Arrow flatten() silently skips null lists — train_bq
    must filter NULL vectors (whole or element) before the reshape."""
    rows = [(i, vec_np[i].tolist()) for i in range(200)]
    rows += [(900, None), (901, [None] + [0.5] * (DIM - 1))]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    model = train_bq(df, max_train_rows=1000)
    clean = train_bq(
        spark.createDataFrame(rows[:200], "id long, embedding array<float>"),
        max_train_rows=1000,
    )
    np.testing.assert_allclose(model.thresholds, clean.thresholds, rtol=1e-12)


# ---------------------------------------------------------------------------
# r11: candidate-saturation delegation (measured: two-pass loses 12x to
# the exact sweep at 10k queries x 2M rows — SCALE.md r11)
# ---------------------------------------------------------------------------


def test_saturation_delegates_to_exact(coded, queries, bq, vectors):
    """M*take >= saturation*N: the call IS knn_join — no semi-join, no
    Hamming stage in the plan, results bit-identical to the exact scan."""
    out = bq_search_batch(coded, queries, bq, k=K, overfetch=32)  # default sat
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" not in plan
    exact = knn_join(coded.drop("bq_code"), queries, k=K)
    a = [tuple(r) for r in out.orderBy("query_id", "rank").collect()]
    e = [tuple(r) for r in exact.orderBy("query_id", "rank").collect()]
    assert a == e


def test_unsaturated_keeps_two_pass(coded, bq):
    """One query at small take: N >> take/saturation, the two-pass plan
    (semi-join re-rank) stays."""
    one = queries_one = coded.where(F.col("id") == 0).select(
        F.col("id").alias("query_id"), "embedding"
    )
    out = bq_search_batch(coded, one, bq, k=K, overfetch=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert out.count() == K


def test_saturation_pin_none_keeps_two_pass(coded, queries, bq):
    """delegate_saturation=None pins the Hamming plan even when
    saturated — the recall gates' and tuner's contract."""
    out = bq_search_batch(
        coded, queries, bq, k=K, overfetch=32, delegate_saturation=None
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_no_rerank_never_delegates(coded, queries, bq):
    """exact_rerank=False outputs Hamming distances — no exact plan has
    that schema, so saturation must not reroute it."""
    out = bq_search_batch(coded, queries, bq, k=K, overfetch=32,
                          exact_rerank=False)
    assert set(out.columns) == {"query_id", "id", "hamming"}
