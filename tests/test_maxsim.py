"""Late-interaction (MaxSim) retrieval: hand oracle, strategy parity,
NULL rule, determinism, packed input, auto-dispatch dtype gate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.maxsim import (
    EXPR_MAX_QUERY_TOKENS,
    maxsim_join,
    pack_doc_tokens,
)

K = 3
N_DOCS = 40
TOKENS_PER_DOC = 5
N_QUERIES = 6
TOKENS_PER_QUERY = 4
DIM = 16


def _numpy_maxsim(doc_toks, query_toks, k, metric="cosine"):
    """Brute-force oracle: doc_toks/query_toks are {id: [vec, ...]}."""

    def norm(v):
        v = np.asarray(v, dtype=np.float64)
        return v / max(np.linalg.norm(v), 1e-8)

    out = {}
    for qid, qts in query_toks.items():
        scores = []
        for did, dts in doc_toks.items():
            s = 0.0
            for qt in qts:
                if metric == "cosine":
                    best = max(float(np.dot(norm(qt), norm(dt))) for dt in dts)
                else:
                    best = max(
                        float(
                            np.dot(
                                np.asarray(qt, np.float64),
                                np.asarray(dt, np.float64),
                            )
                        )
                        for dt in dts
                    )
                s += best
            scores.append((did, s))
        scores.sort(key=lambda t: (-t[1], t[0]))
        out[qid] = scores[:k]
    return out


@pytest.fixture(scope="module")
def token_data():
    rng = np.random.default_rng(711 * 31)
    doc_toks = {
        d: rng.normal(size=(TOKENS_PER_DOC, DIM)).astype(np.float32).tolist()
        for d in range(N_DOCS)
    }
    query_toks = {
        q: rng.normal(size=(TOKENS_PER_QUERY, DIM)).astype(np.float32).tolist()
        for q in range(N_QUERIES)
    }
    return doc_toks, query_toks


@pytest.fixture(scope="module")
def token_dfs(spark, token_data):
    doc_toks, query_toks = token_data
    drows = [
        (int(d), [float(x) for x in t])
        for d, ts in doc_toks.items()
        for t in ts
    ]
    qrows = [
        (int(q), [float(x) for x in t])
        for q, ts in query_toks.items()
        for t in ts
    ]
    docs = spark.createDataFrame(drows, "doc_id long, embedding array<float>")
    queries = spark.createDataFrame(
        qrows, "query_id long, embedding array<float>"
    )
    return docs, queries


def _collect(df):
    return {
        qid: [(r["doc_id"], r["score"]) for r in rows]
        for qid, rows in _group(df.orderBy("query_id", "rank").collect())
    }


def _group(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append(r)
    return out.items()


@pytest.mark.parametrize("strategy", ["expression", "blocked"])
@pytest.mark.parametrize("metric", ["cosine", "dot_product"])
def test_matches_numpy_oracle(token_dfs, token_data, strategy, metric):
    docs, queries = token_dfs
    doc_toks, query_toks = token_data
    expect = _numpy_maxsim(doc_toks, query_toks, K, metric)
    got = _collect(
        maxsim_join(docs, queries, k=K, metric=metric, strategy=strategy)
    )
    assert set(got) == set(expect)
    for qid in expect:
        assert [d for d, _ in got[qid]] == [d for d, _ in expect[qid]]
        for (_, gs), (_, es) in zip(got[qid], expect[qid]):
            assert gs == pytest.approx(es, abs=1e-9)


def test_rank_column_and_row_count(token_dfs):
    docs, queries = token_dfs
    out = maxsim_join(docs, queries, k=K).collect()
    assert len(out) == N_QUERIES * K
    by_q = dict(_group(out))
    for rows in by_q.values():
        assert [r["rank"] for r in rows] == list(range(1, K + 1))


def test_strategy_parity(token_dfs):
    docs, queries = token_dfs
    a = maxsim_join(docs, queries, k=K, strategy="expression")
    b = maxsim_join(docs, queries, k=K, strategy="blocked")
    ra = [(r["query_id"], r["doc_id"], r["rank"]) for r in a.orderBy("query_id", "rank").collect()]
    rb = [(r["query_id"], r["doc_id"], r["rank"]) for r in b.orderBy("query_id", "rank").collect()]
    assert ra == rb


def test_packed_input_parity(token_dfs):
    docs, queries = token_dfs
    packed = pack_doc_tokens(docs)
    for strategy in ("expression", "blocked"):
        a = maxsim_join(docs, queries, k=K, strategy=strategy)
        b = maxsim_join(
            packed, queries, k=K, strategy=strategy, doc_tokens_packed=True
        )
        ra = a.orderBy("query_id", "rank").collect()
        rb = b.orderBy("query_id", "rank").collect()
        # scores to fp64 rounding only: the packed plan sums the same
        # maxes in a different order (explode vs collect_list)
        assert [(r["query_id"], r["doc_id"], r["rank"]) for r in ra] == [
            (r["query_id"], r["doc_id"], r["rank"]) for r in rb
        ]
        for x, y in zip(ra, rb):
            assert x["score"] == pytest.approx(y["score"], abs=1e-9)


def test_null_token_parity(spark, token_dfs):
    """NULL token vectors (whole or element) are excluded on both sides;
    an all-NULL query yields no rows — knn_join's engine-wide rule."""
    docs, queries = token_dfs
    null_docs = docs.union(
        spark.createDataFrame(
            [(0, None), (1, [None] * DIM)],
            "doc_id long, embedding array<float>",
        )
    )
    null_queries = queries.union(
        spark.createDataFrame(
            [(0, None), (99, None), (99, [None] * DIM)],
            "query_id long, embedding array<float>",
        )
    )
    for strategy in ("expression", "blocked"):
        clean = maxsim_join(docs, queries, k=K, strategy=strategy)
        dirty = maxsim_join(null_docs, null_queries, k=K, strategy=strategy)
        rc = [tuple(r) for r in clean.orderBy("query_id", "rank").collect()]
        rd = [tuple(r) for r in dirty.orderBy("query_id", "rank").collect()]
        assert rc == rd
        assert not [r for r in rd if r[0] == 99]


def test_tie_break_is_doc_id_asc(spark):
    """Identical docs score identically -> lower doc_id ranks first.

    The query has ONE token: multi-token scores are float SUMS, whose
    accumulation order Spark's unordered aggregate does not fix, so
    "identical" docs can differ in the last ulp on the expression path
    (documented contract: determinism to fp64 rounding). A one-token
    score is a single expression — bitwise equal — so the doc_id ASC
    tie-break is observable on both strategies."""
    tok = [1.0] + [0.0] * (DIM - 1)
    dup = spark.createDataFrame(
        [(7, tok), (3, tok), (5, tok)], "doc_id long, embedding array<float>"
    )
    q1 = spark.createDataFrame(
        [(0, [0.5] * DIM)], "query_id long, embedding array<float>"
    )
    for strategy in ("expression", "blocked"):
        out = (
            maxsim_join(dup, q1, k=3, strategy=strategy)
            .orderBy("rank")
            .collect()
        )
        assert [r["doc_id"] for r in out] == [3, 5, 7], strategy


def test_tie_break_blocked_multi_token(spark, token_dfs):
    """The blocked path sums token maxes in a FIXED order, so identical
    docs tie bitwise even on multi-token queries and rank by doc_id."""
    _, queries = token_dfs
    tok = [1.0] + [0.0] * (DIM - 1)
    dup = spark.createDataFrame(
        [(7, tok), (3, tok), (5, tok)], "doc_id long, embedding array<float>"
    )
    out = (
        maxsim_join(dup, queries.where(F.col("query_id") == 0), k=3,
                    strategy="blocked")
        .orderBy("rank")
        .collect()
    )
    assert [r["doc_id"] for r in out] == [3, 5, 7]


def test_repeated_query_token_counts_twice(spark):
    """A query that repeats a token vector gets that token's max twice —
    the per-token key must keep identical vectors distinct."""
    docs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "doc_id long, embedding array<float>",
    )
    q1 = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [1.0, 0.0])],
        "query_id long, embedding array<float>",
    )
    q2 = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id long, embedding array<float>"
    )
    for strategy in ("expression", "blocked"):
        s2 = maxsim_join(docs, q1, k=1, strategy=strategy).collect()[0]["score"]
        s1 = maxsim_join(docs, q2, k=1, strategy=strategy).collect()[0]["score"]
        assert s2 == pytest.approx(2 * s1, abs=1e-9)


def test_auto_keeps_expression_for_small_batches(token_dfs):
    docs, queries = token_dfs
    out = maxsim_join(docs, queries, k=K, strategy="auto")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the expression plan has no Python worker stage
    assert "mapInPandas" not in plan.lower().replace("_", "")
    assert N_QUERIES * TOKENS_PER_QUERY <= EXPR_MAX_QUERY_TOKENS


def test_auto_non_long_ids_stay_expression(spark, token_dfs):
    """The delegation dtype gate: int ids never flip to the blocked
    path's long schema, regardless of query-token count."""
    docs, queries = token_dfs
    docs_i = docs.withColumn("doc_id", F.col("doc_id").cast("int"))
    out = maxsim_join(docs_i, queries, k=K, strategy="auto")
    assert dict(out.dtypes)["doc_id"] == "int"


def test_errors(token_dfs):
    docs, queries = token_dfs
    with pytest.raises(ValueError, match="euclidean|cosine"):
        maxsim_join(docs, queries, k=K, metric="euclidean")
    with pytest.raises(ValueError, match="strategy"):
        maxsim_join(docs, queries, k=K, strategy="nope")
    with pytest.raises(ValueError, match="k must be"):
        maxsim_join(docs, queries, k=0)
    with pytest.raises(ValueError, match="doc_id"):
        maxsim_join(docs.withColumnRenamed("doc_id", "x"), queries, k=K)


def test_blocked_doc_chunking_boundary(spark, token_data):
    """Docs split across artificial small Arrow batches still score
    whole (packing guarantees doc-local tokens per row)."""
    doc_toks, query_toks = token_data
    drows = [
        (int(d), [float(x) for x in t])
        for d, ts in doc_toks.items()
        for t in ts
    ]
    docs = spark.createDataFrame(
        drows, "doc_id long, embedding array<float>"
    ).repartition(7)
    qrows = [
        (int(q), [float(x) for x in t])
        for q, ts in query_toks.items()
        for t in ts
    ]
    queries = spark.createDataFrame(
        qrows, "query_id long, embedding array<float>"
    )
    expect = _numpy_maxsim(doc_toks, query_toks, K)
    got = _collect(maxsim_join(docs, queries, k=K, strategy="blocked"))
    for qid in expect:
        assert [d for d, _ in got[qid]] == [d for d, _ in expect[qid]]


# ---------------------------------------------------------------------------
# r11 second half: the BQ-coded Hamming funnel (PLAID-shaped)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def funnel_parts(spark, token_dfs):
    from mlx_vector_db_spark.operators.bq import train_bq
    from mlx_vector_db_spark.operators.maxsim import pack_doc_token_codes

    docs, queries = token_dfs
    bq = train_bq(docs, seed=3)
    codes = pack_doc_token_codes(docs, bq).cache()
    return docs, queries, bq, codes


def test_funnel_full_overfetch_equals_exact(funnel_parts):
    """take >= n_docs: the funnel's candidate set is every doc, so the
    output must EQUAL maxsim_join exactly (the re-rank adds no error)."""
    from mlx_vector_db_spark.operators.maxsim import maxsim_funnel

    docs, queries, bq, codes = funnel_parts
    out = maxsim_funnel(codes, docs, queries, bq, k=K,
                        overfetch=(N_DOCS + K - 1) // K,
                        delegate_saturation=None)
    exact = maxsim_join(docs, queries, k=K)
    a = [(r["query_id"], r["doc_id"], r["rank"])
         for r in out.orderBy("query_id", "rank").collect()]
    e = [(r["query_id"], r["doc_id"], r["rank"])
         for r in exact.orderBy("query_id", "rank").collect()]
    assert a == e


def test_funnel_shape_and_recall(funnel_parts):
    """Moderate overfetch: k rows per query, recall vs exact >= 0.8 on
    the random fixture (sign bits on 16-dim uniform data are the
    worst case; the gate entry measures the honest 64-dim corpus)."""
    from mlx_vector_db_spark.operators.maxsim import maxsim_funnel

    docs, queries, bq, codes = funnel_parts
    out = maxsim_funnel(codes, docs, queries, bq, k=K, overfetch=8,
                        delegate_saturation=None)
    rows = out.collect()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["doc_id"])
    exact = maxsim_join(docs, queries, k=K).collect()
    want = {}
    for r in exact:
        want.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert set(got) == set(want)
    total_hits = sum(len(got[q] & want[q]) for q in want)
    assert total_hits >= 0.8 * N_QUERIES * K, total_hits
    for q, s in got.items():
        assert len(s) == K


def test_funnel_null_queries_excluded(spark, funnel_parts):
    from mlx_vector_db_spark.operators.maxsim import maxsim_funnel

    docs, queries, bq, codes = funnel_parts
    nullq = queries.union(
        spark.createDataFrame(
            [(99, None)], "query_id long, embedding array<float>"
        )
    )
    out = maxsim_funnel(codes, docs, nullq, bq, k=K, overfetch=8,
                        delegate_saturation=None)
    assert not [r for r in out.collect() if r["query_id"] == 99]


def test_funnel_validation(funnel_parts):
    from mlx_vector_db_spark.operators.maxsim import (
        maxsim_funnel,
        pack_doc_token_codes,
    )

    docs, queries, bq, codes = funnel_parts
    with pytest.raises(ValueError, match="BQModel"):
        maxsim_funnel(codes, docs, queries, bq="nope", k=K)
    with pytest.raises(ValueError, match="overfetch"):
        maxsim_funnel(codes, docs, queries, bq, k=K, overfetch=0)
    with pytest.raises(ValueError, match="token_codes"):
        maxsim_funnel(docs, docs, queries, bq, k=K)
    with pytest.raises(ValueError, match="BQModel"):
        pack_doc_token_codes(docs, bq="nope")


def test_pack_doc_token_codes_matches_driver_pack(funnel_parts, token_data):
    """The distributed encode+pack agrees byte-for-byte with the
    driver-side BQModel.pack on each doc's token set."""
    docs, _, bq, codes = funnel_parts
    doc_toks, _ = token_data
    rows = codes.where(F.col("doc_id") < 3).collect()
    for r in rows:
        want = bq.pack(np.asarray(doc_toks[r["doc_id"]], dtype=np.float64))
        got = np.frombuffer(b"".join(r["token_codes"]), dtype=np.uint8).reshape(
            len(r["token_codes"]), -1
        )
        # collect_list order is not guaranteed: compare as multisets
        assert sorted(map(bytes, got)) == sorted(map(bytes, want))


def test_mmr_composes_over_maxsim_pool(spark, token_dfs):
    """Composability: a MaxSim pool diversity-reranked by MMR — the doc
    representative for the diversity term is the mean token vector
    (posexplode-free: F.aggregate elementwise sum / count), relevance is
    the MaxSim score. Checks the composition runs distributed and
    returns k diverse docs per query with rank 1..k."""
    from mlx_vector_db_spark.operators.mmr import mmr_rerank

    docs, queries = token_dfs
    pool = maxsim_join(docs, queries, k=8)
    centroid = (
        docs.groupBy("doc_id")
        .agg(
            F.aggregate(
                F.collect_list("embedding"),
                F.array_repeat(F.lit(0.0), DIM),
                lambda acc, v: F.zip_with(
                    acc, v, lambda a, b: a + b.cast("double")
                ),
            ).alias("sum_vec"),
            F.count(F.lit(1)).alias("n_tok"),
        )
        .select(
            "doc_id",
            F.transform(
                "sum_vec", lambda x: x / F.col("n_tok")
            ).alias("embedding"),
        )
    )
    cand = pool.join(centroid, on="doc_id").select(
        "query_id", F.col("doc_id").alias("id"), "embedding",
        F.col("score").alias("similarity"),
    )
    out = mmr_rerank(cand, k=K, lambda_=0.5)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(N_QUERIES))
    for q, rs in by_q.items():
        assert sorted(r["rank"] for r in rs) == list(range(1, K + 1))
        assert len({r["id"] for r in rs}) == K


# ---------------------------------------------------------------------------
# r12: token-budget chunking, id fail-fast, packed NULL rule, filtered MaxSim
# ---------------------------------------------------------------------------


def test_token_chunk_bounds_unit():
    """Greedy split: token budget binds, oversized single docs form
    their own chunk, docs_cap binds, and coverage is a partition."""
    from mlx_vector_db_spark.operators.maxsim import _token_chunk_bounds

    lens = np.array([3, 5, 2, 9, 1, 1])
    assert _token_chunk_bounds(lens, 8, 100) == [(0, 2), (2, 3), (3, 4), (4, 6)]
    # a doc larger than the whole budget is its own chunk
    assert _token_chunk_bounds(np.array([20]), 8, 100) == [(0, 1)]
    # doc cap binds when tokens would allow more
    assert _token_chunk_bounds(np.array([1] * 10), 100, 4) == [
        (0, 4), (4, 8), (8, 10)
    ]
    # partition invariant on random ragged shapes
    rng = np.random.default_rng(0)
    for _ in range(25):
        L = rng.integers(1, 50, size=int(rng.integers(1, 40)))
        bs = _token_chunk_bounds(
            L, int(rng.integers(1, 100)), int(rng.integers(1, 10))
        )
        flat = [i for c0, c1 in bs for i in range(c0, c1)]
        assert flat == list(range(len(L)))
        csum = np.cumsum(L)
        for c0, c1 in bs:
            toks = int(csum[c1 - 1] - (csum[c0 - 1] if c0 else 0))
            # within budget unless the chunk is a single oversized doc
            assert toks <= max(100, int(L[c0])) or c1 - c0 == 1


def test_blocked_token_budget_heavy_density(spark, monkeypatch):
    """VERDICT r11 #1 regression: with the element budget shrunk so the
    doc axis splits on cumulative TOKEN count mid-batch (ragged 1-60
    tokens/doc straddling every boundary), the blocked sweep stays in
    exact rank parity with the expression plan."""
    import mlx_vector_db_spark.operators.maxsim as mx

    monkeypatch.setattr(mx, "_MAXSIM_SLICE_ELEMS", 4096)
    rng = np.random.default_rng(12)
    dim = 32
    drows = [
        (d, rng.normal(size=dim).astype(float).tolist())
        for d in range(30)
        for _ in range(int(rng.integers(1, 60)))
    ]
    docs = spark.createDataFrame(drows, "doc_id long, embedding array<float>")
    qrows = [
        (q, rng.normal(size=dim).astype(float).tolist())
        for q in range(4)
        for _ in range(6)
    ]
    queries = spark.createDataFrame(
        qrows, "query_id long, embedding array<float>"
    )
    a = maxsim_join(docs, queries, k=5, strategy="expression")
    b = maxsim_join(docs, queries, k=5, strategy="blocked")
    ra = [(r["query_id"], r["doc_id"], r["rank"])
          for r in a.orderBy("query_id", "rank").collect()]
    rb = [(r["query_id"], r["doc_id"], r["rank"])
          for r in b.orderBy("query_id", "rank").collect()]
    assert ra == rb

    # the funnel under the same tiny budget, saturating overfetch ==
    # exact (its code matrix now chunks on tokens too)
    from mlx_vector_db_spark.operators.bq import train_bq
    from mlx_vector_db_spark.operators.maxsim import (
        maxsim_funnel,
        pack_doc_token_codes,
    )

    bq = train_bq(docs, seed=5)
    codes = pack_doc_token_codes(docs, bq)
    out = maxsim_funnel(codes, docs, queries, bq, k=5, overfetch=6,
                        delegate_saturation=None)
    rf = [(r["query_id"], r["doc_id"], r["rank"])
          for r in out.orderBy("query_id", "rank").collect()]
    assert rf == ra


def test_blocked_string_ids_fail_fast(token_dfs):
    """VERDICT r11 #2: explicit blocked strategy rejects non-integral
    ids with the engine's clear ValueError, not a numpy cast error."""
    docs, queries = token_dfs
    sdocs = docs.withColumn("doc_id", F.col("doc_id").cast("string"))
    with pytest.raises(ValueError, match="integral"):
        maxsim_join(sdocs, queries, k=K, strategy="blocked")
    squeries = queries.withColumn(
        "query_id", F.concat(F.lit("q"), F.col("query_id"))
    )
    with pytest.raises(ValueError, match="integral"):
        maxsim_join(docs, squeries, k=K, strategy="blocked")


def test_funnel_string_ids_fail_fast(funnel_parts):
    from mlx_vector_db_spark.operators.maxsim import maxsim_funnel

    docs, queries, bq, codes = funnel_parts
    scodes = codes.withColumn("doc_id", F.col("doc_id").cast("string"))
    with pytest.raises(ValueError, match="integral"):
        maxsim_funnel(scodes, docs, queries, bq, k=K)
    squeries = queries.withColumn(
        "query_id", F.col("query_id").cast("string")
    )
    with pytest.raises(ValueError, match="integral"):
        maxsim_funnel(codes, docs, squeries, bq, k=K)


def test_packed_null_entries_parity(spark, token_dfs):
    """ADVICE r11: caller-supplied packed frames with NULL token entries
    (or NULL-element tokens) follow the engine NULL rule on BOTH
    strategies instead of crashing the blocked worker's np.asarray."""
    docs, queries = token_dfs
    packed = pack_doc_tokens(docs)
    dirty = packed.withColumn(
        "token_vecs",
        F.concat(
            F.array(F.lit(None).cast("array<float>")),
            F.col("token_vecs"),
            F.array(F.array(*([F.lit(None).cast("float")] * DIM))),
        ),
    )
    for strategy in ("expression", "blocked"):
        clean = maxsim_join(
            packed, queries, k=K, strategy=strategy, doc_tokens_packed=True
        )
        got = maxsim_join(
            dirty, queries, k=K, strategy=strategy, doc_tokens_packed=True
        )
        rc = clean.orderBy("query_id", "rank").collect()
        rd = got.orderBy("query_id", "rank").collect()
        assert [(r["query_id"], r["doc_id"], r["rank"]) for r in rc] == [
            (r["query_id"], r["doc_id"], r["rank"]) for r in rd
        ], strategy
        for x, y in zip(rc, rd):
            assert x["score"] == pytest.approx(y["score"], abs=1e-9)


def test_filter_metadata_parity(spark, token_dfs):
    """Filtered MaxSim (P1 analog): filter-then-topk == topk-of-filtered
    on both strategies; only matching docs appear."""
    docs, queries = token_dfs
    tagged = docs.withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, "en").otherwise("de")
    )
    pre = tagged.where(F.col("lang") == "en").drop("lang")
    for strategy in ("expression", "blocked"):
        a = maxsim_join(
            tagged, queries, k=K, strategy=strategy,
            filter_metadata={"lang": "en"},
        )
        b = maxsim_join(pre, queries, k=K, strategy=strategy)
        ra = [(r["query_id"], r["doc_id"], r["rank"])
              for r in a.orderBy("query_id", "rank").collect()]
        rb = [(r["query_id"], r["doc_id"], r["rank"])
              for r in b.orderBy("query_id", "rank").collect()]
        assert ra == rb, strategy
        assert ra and all(d % 3 == 0 for _, d, _ in ra)
    # packed input path
    ptag = pack_doc_tokens(tagged.drop("lang")).withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, "en").otherwise("de")
    )
    c = maxsim_join(
        ptag, queries, k=K, strategy="blocked", doc_tokens_packed=True,
        filter_metadata={"lang": "en"},
    )
    rcp = [(r["query_id"], r["doc_id"], r["rank"])
           for r in c.orderBy("query_id", "rank").collect()]
    assert rcp == rb


def test_funnel_filter_metadata(spark, funnel_parts):
    """Funnel under filter (reference overfetch-then-filter shape): at
    saturating overfetch the output equals the exact filtered operator;
    non-matching docs never appear."""
    from mlx_vector_db_spark.operators.maxsim import maxsim_funnel

    docs, queries, bq, codes = funnel_parts
    tagged = docs.withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, "en").otherwise("de")
    )
    out = maxsim_funnel(
        codes, tagged, queries, bq, k=K,
        overfetch=(N_DOCS + K - 1) // K,
        filter_metadata={"lang": "en"},
        delegate_saturation=None,
    )
    exact = maxsim_join(tagged, queries, k=K, filter_metadata={"lang": "en"})
    a = [(r["query_id"], r["doc_id"], r["rank"])
         for r in out.orderBy("query_id", "rank").collect()]
    e = [(r["query_id"], r["doc_id"], r["rank"])
         for r in exact.orderBy("query_id", "rank").collect()]
    assert a == e
    assert a and all(d % 3 == 0 for _, d, _ in a)


def test_funnel_saturation_delegation(funnel_parts):
    """Engine-wide r11 rule on the funnel (r12): when M * k * overfetch
    saturates the doc corpus, the default delegates to ONE exact sweep
    — identical schema, exact values (equal to the pinned funnel at
    saturating overfetch), and the executed plan has no Python worker
    stage (the exact path's expression plan), proving the two-pass
    kernel never ran."""
    from mlx_vector_db_spark.operators.maxsim import maxsim_funnel

    docs, queries, bq, codes = funnel_parts
    over = (N_DOCS + K - 1) // K  # saturating: take >= N_DOCS
    delegated = maxsim_funnel(codes, docs, queries, bq, k=K, overfetch=over)
    plan = delegated._jdf.queryExecution().executedPlan().toString()
    assert "mapinpandas" not in plan.lower().replace("_", "")
    pinned = maxsim_funnel(codes, docs, queries, bq, k=K, overfetch=over,
                           delegate_saturation=None)
    a = [(r["query_id"], r["doc_id"], r["rank"])
         for r in delegated.orderBy("query_id", "rank").collect()]
    b = [(r["query_id"], r["doc_id"], r["rank"])
         for r in pinned.orderBy("query_id", "rank").collect()]
    assert a == b
    # an UNsaturated call keeps the funnel. r13: the candidate pass runs
    # EAGERLY at call time (bounded collect) and the returned plan is
    # the re-rank over the PUSHED candidate id set — no Python stage in
    # the returned plan (it already ran), and the candidate filter is
    # visible as an IN/INSET predicate on doc_id
    kept = maxsim_funnel(codes, docs, queries, bq, k=1, overfetch=1)
    kplan = kept._jdf.queryExecution().executedPlan().toString().lower()
    assert ("inset" in kplan) or (" in (" in kplan)
    assert "doc_id" in kplan


def test_tune_overfetch_maxsim(spark, funnel_parts):
    """Self-calibration: chosen rung meets the target and is minimal
    over the tried rungs; the curve is measured against the exact
    operator; a filter changes the truth set (calibrate-with-filter
    semantics); bad targets fail fast."""
    from mlx_vector_db_spark.operators.maxsim import tune_overfetch_maxsim

    docs, queries, bq, codes = funnel_parts
    chosen, curve = tune_overfetch_maxsim(
        codes, docs, queries, bq, k=K, target_recall=0.8,
        candidates=[1, 2, 4, 8, 16],
    )
    assert chosen in curve and curve[chosen] >= 0.8
    assert all(v < 0.8 for c, v in curve.items() if c < chosen)
    # a saturating rung always clears any target: recall 1.0 at
    # take >= N_DOCS (funnel == exact, pinned tier)
    full = (N_DOCS + K - 1) // K
    _, curve_full = tune_overfetch_maxsim(
        codes, docs, queries, bq, k=K, target_recall=1.0,
        candidates=[full],
    )
    assert curve_full[full] == pytest.approx(1.0)
    # filtered calibration: the truth set is the FILTERED exact top-k
    tagged = docs.withColumn(
        "grp", (F.col("doc_id") % 2).cast("int")
    )
    tcodes = codes.withColumn("grp", (F.col("doc_id") % 2).cast("int"))
    ch_f, curve_f = tune_overfetch_maxsim(
        tcodes, tagged, queries, bq, k=K, target_recall=0.8,
        candidates=[full], filter_metadata={"grp": 0},
    )
    assert curve_f[full] == pytest.approx(1.0)  # saturating + filter
    with pytest.raises(ValueError, match="target_recall"):
        tune_overfetch_maxsim(codes, docs, queries, bq, target_recall=0.0)


def test_funnel_pass2_candidate_pushdown_reaches_parquet(
    spark, funnel_parts, tmp_path, monkeypatch
):
    """r13: the funnel's pass-2 re-rank pushes the driver-bounded
    candidate id list into the float-table scan as an In filter —
    visible as PushedFilters In(doc_id, ...) on a parquet doc table —
    so parquet row-group/page stats prune the re-rank read (the byte
    story measured in BENCH_r13_maxsim_throttled*). Past the bound the
    lazy semi-join fallback keeps pass 2 distributed."""
    from mlx_vector_db_spark.operators import maxsim as M

    docs, queries, bq, codes = funnel_parts
    pdir = tmp_path / "packed"
    M.pack_doc_tokens(docs).write.mode("overwrite").parquet(str(pdir))
    packed = spark.read.parquet(str(pdir))
    out = M.maxsim_funnel(
        codes, packed, queries, bq, k=2, overfetch=2,
        doc_tokens_packed=True, delegate_saturation=None,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(doc_id" in plan
    # parity with the semi-join fallback (forced via the limit)
    monkeypatch.setattr(M, "_FUNNEL_PUSHDOWN_LIMIT", 0)
    fb = M.maxsim_funnel(
        codes, packed, queries, bq, k=2, overfetch=2,
        doc_tokens_packed=True, delegate_saturation=None,
    )
    fplan = fb._jdf.queryExecution().executedPlan().toString().lower()
    assert "mapinpandas" in fplan.replace("_", "")  # lazy pass-1 retained
    a = [(r["query_id"], r["doc_id"], r["rank"])
         for r in out.orderBy("query_id", "rank").collect()]
    b = [(r["query_id"], r["doc_id"], r["rank"])
         for r in fb.orderBy("query_id", "rank").collect()]
    assert a == b
