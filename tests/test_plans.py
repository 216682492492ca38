"""Plan-shape regression tests: the properties that make the operators
scale (pushdown, pruning, map-side top-k, broadcasts) asserted on the
real physical plans.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.knn import knn_join, knn_query
from mlx_vector_db_spark.plans import explain_str
from mlx_vector_db_spark.queries import QUERIES


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/embeddings.parquet")


def test_knn_query_is_take_ordered_with_pushed_filter(emb):
    q0 = emb.first()["embedding"]
    plan = explain_str(
        knn_query(
            emb, q0, k=5, vec_col="embedding", id_col="vec_id",
            filter_metadata={"label": 3},
        )
    )
    assert "TakeOrderedAndProject" in plan      # no shuffle for single-query top-k
    # the engine-wide NULL-vector exclusion rides the same pushdown —
    # the parquet reader itself skips NULL-embedding rows
    assert (
        "PushedFilters: [IsNotNull(label), EqualTo(label,3), IsNotNull(embedding)]"
        in plan
    )
    assert "Exchange" not in plan               # scan -> project -> heap, no shuffle


def test_knn_join_uses_window_group_limit_and_broadcast(emb):
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    plan = explain_str(
        knn_join(emb, queries, k=5, vec_col="embedding", id_col="vec_id")
    )
    # partial group-limit before the shuffle = map-side top-k
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert "BroadcastNestedLoopJoin" in plan    # query side broadcast


def test_top_orders_plan_broadcasts_and_take_ordered(spark, sf_small):
    # no explicit broadcast hint on the (sf-scaling) customer side —
    # at this scale the size ESTIMATE auto-broadcasts it; at sf100 the
    # same query must be free to fall back to a shuffle join (a forced
    # hint measured 19x there)
    plan = explain_str(QUERIES["top_orders"](spark, sf_small))
    assert "TakeOrderedAndProject(limit=10" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan          # nothing big-big at sf0.001


def test_bm25_topk_is_take_ordered(spark, sf_small):
    from mlx_vector_db_spark.operators.hybrid import bm25_topk

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = explain_str(bm25_topk(docs, ["the", "data"], k=10))
    # global top-k is ORDER BY + LIMIT, not a corpus-wide rank window:
    # per-partition heaps + driver merge, never a single-partition sort
    assert "TakeOrderedAndProject(limit=10" in plan


def test_text_stats_scan_is_column_pruned(spark, sf_small):
    plan = explain_str(QUERIES["text_stats"](spark, sf_small))
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_pricing_summary_partial_aggregate(spark, sf_small):
    plan = explain_str(QUERIES["pricing_summary"](spark, sf_small))
    # map-side combine before the exchange
    assert "partial_sum" in plan or "partial_count" in plan
    assert plan.count("Exchange") <= 2


def test_store_query_prunes_columns(spark, tmp_path):
    from mlx_vector_db_spark.store import VectorStoreCatalog

    cat = VectorStoreCatalog(spark, tmp_path / "s")
    st = cat.create_store("u", "m", dimension=4, promoted_keys={"category": "string"})
    st.add_vectors([[0.1, 0.2, 0.3, 0.4]] * 8, [{"category": "A"}] * 8)
    plan = explain_str(st.query([0.1, 0.2, 0.3, 0.4], k=2, filter_metadata={"category": "A"}))
    assert (
        "PushedFilters: [IsNotNull(category), EqualTo(category,A), IsNotNull(embedding)]"
        in plan
    )


def test_jaccard_pairs_relational_plan_no_cross_join(spark, sf_small):
    """threshold > 0 exact Jaccard must plan as a shingle-keyed
    equi-join + count aggregation — never a cartesian/nested-loop scan
    of the pair space."""
    from mlx_vector_db_spark.operators.dedup import jaccard_pairs

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = explain_str(jaccard_pairs(docs, threshold=0.5))
    # the only nested-loop join allowed is the (normally empty)
    # empty-doc duplicate branch, which joins two filtered-empty sides
    assert plan.count("CartesianProduct") <= 1
    assert "HashAggregate" in plan  # intersection counts aggregate
    assert "array_intersect" not in plan  # no per-pair set ops at threshold>0


def test_signature_stages_are_map_only(spark, sf_small):
    """MinHash/SimHash signature computation must not shuffle: no
    hash-partitioned Exchange may appear in the fingerprint subplans
    (the rebalance RoundRobin repartition is the only exchange)."""
    from mlx_vector_db_spark.operators.dedup import simhash_signatures

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = explain_str(simhash_signatures(docs))
    assert "hashpartitioning" not in plan
    assert "roundrobin" in plan.lower()  # the compute rebalance remains


def test_rebalance_probe_memoized(spark, sf_small):
    """The partition-count probe is memoized on the analyzed plan's
    semanticHash: re-deriving the same projection from a fresh read does
    not grow the cache, and a different projection does."""
    from mlx_vector_db_spark.rebalance import _PROBE_CACHE, rebalance_for_compute

    _PROBE_CACHE.clear()
    a = spark.read.parquet(f"{sf_small}/documents.parquet")
    rebalance_for_compute(a, "doc_id", "text")
    assert len(_PROBE_CACHE) == 1
    b = spark.read.parquet(f"{sf_small}/documents.parquet")
    rebalance_for_compute(b, "doc_id", "text")
    assert len(_PROBE_CACHE) == 1          # same shape -> cache hit
    rebalance_for_compute(b, "doc_id")
    assert len(_PROBE_CACHE) == 2          # new shape -> new entry


def test_pushdown_barrier_noncaching_fences_filter(spark, sf_small):
    """cache=False barrier: heavy computed-column filters stay ABOVE an
    RDD-scan boundary (no parquet PushedFilters on the signal), rows
    unchanged, and nothing is persisted."""
    from mlx_vector_db_spark.rebalance import pushdown_barrier

    jsc = spark.sparkContext._jsc.sc()
    stored_before = len(jsc.getRDDStorageInfo())
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    fenced = pushdown_barrier(docs.select("doc_id", "text"), cache=False)
    heavy = fenced.withColumn("sig", F.length("text")).where(F.col("sig") > 100)
    plan = explain_str(heavy)
    assert "ExistingRDD" in plan           # the fence is an RDD scan
    got = heavy.count()
    want = docs.where(F.length("text") > 100).count()
    assert got == want
    # the fence itself pins nothing (other tests' lazy checkpoints may
    # already hold blocks in the shared session — assert no growth)
    assert len(jsc.getRDDStorageInfo()) <= stored_before


def test_jaccard_cap_adds_no_shuffle(spark, sf_small):
    """The max_shingle_freq filter is a semi-join against the
    checkpointed kept-band (2 <= df <= cap) shingle list: the capped
    plan must add NO hash-partitioned shuffle over the corpus (the df
    aggregate materializes once outside this plan; at this scale the
    per-side semi-joins broadcast the list)."""
    from mlx_vector_db_spark.operators.dedup import jaccard_pairs

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    uncapped = explain_str(jaccard_pairs(docs, threshold=0.5))
    capped = explain_str(jaccard_pairs(docs, threshold=0.5, max_shingle_freq=4))
    assert (capped.count("Exchange hashpartitioning")
            <= uncapped.count("Exchange hashpartitioning"))


def test_vocab_coverage_top_n_is_take_ordered_and_broadcast(spark, sf_small):
    from mlx_vector_db_spark.operators.tokenizer import vocab_coverage

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = explain_str(vocab_coverage(docs, vocab_size=100))
    # top-N vocab via distributed partial top-k, never a one-partition
    # global sort-or-window; the N-row vocab side broadcasts
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_bpe_pair_counts_is_two_partial_aggs_no_udf(spark, sf_small):
    from mlx_vector_db_spark.operators.tokenizer import bpe_pair_counts

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = explain_str(bpe_pair_counts(docs))
    # corpus word count + vocab pair count, both map-side combined;
    # pure codegen expressions — no Python in the plan
    assert plan.count("partial_count") + plan.count("partial_sum") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # only the two aggregation exchanges: corpus->word, vocab->pair
    assert plan.count("Exchange hashpartitioning") == 2


def test_winnow_crossdoc_join_is_keyed_by_fingerprint(spark, sf_small):
    from mlx_vector_db_spark.operators.quality import winnow_crossdoc_pairs

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = explain_str(
        winnow_crossdoc_pairs(docs, min_shared=2, max_fp_docs=8)
    )
    # the self-join is an EQUI-join keyed by the fingerprint value
    # (broadcast at toy scale, shuffle-on-fingerprint at corpus scale —
    # never a cartesian pair enumeration); the kept-band df filter is
    # applied as a semi-join before the self-join
    assert "Join [fingerprint" in plan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_release_intermediates_frees_dead_checkpoints(spark, sf_small):
    """A lazy localCheckpoint whose DataFrame has died must release its
    executor blocks after release_intermediates (the ContextCleaner
    path) — the guard against cumulative-storage OOM in long sessions."""
    import time

    from mlx_vector_db_spark.session import release_intermediates

    jsc = spark.sparkContext._jsc.sc()

    def n_blocks():
        return len(jsc.getRDDStorageInfo())

    df = spark.read.parquet(f"{sf_small}/documents.parquet").localCheckpoint(
        eager=False
    )
    df.count()  # materialize the checkpoint blocks
    assert n_blocks() > 0
    before = n_blocks()
    del df
    release_intermediates(spark)
    # cleaner runs asynchronously; poll briefly
    deadline = time.time() + 15
    while n_blocks() >= before and time.time() < deadline:
        time.sleep(0.5)
        release_intermediates(spark)
    assert n_blocks() < before


def test_dsir_selection_is_take_ordered_broadcast_ratio(spark, sf_small):
    """DSIR: the final selection is a distributed partial top-k (never
    a global sort), the n_buckets-row ratio table broadcasts against
    the corpus feature stream, and no Python runs anywhere (md5
    bucketing is pure codegen)."""
    from mlx_vector_db_spark.operators.dsir import dsir_resample

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    tgt = docs.where(F.col("lang") == "en")
    plan = explain_str(dsir_resample(docs, tgt, 10, n_buckets=512))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin [bucket" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_bigram_lm_model_joins_are_keyed_no_python(spark, sf_small):
    """bigram_lm_scores: all three model probes are EQUI-joins keyed by
    token/pair (broadcast at this scale; token-keyed shuffle at worst —
    never nested-loop against the corpus), and the whole plan is pure
    codegen expressions."""
    from mlx_vector_db_spark.operators.quality import bigram_lm_scores

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = explain_str(bigram_lm_scores(docs, docs.where(F.col("lang") == "en")))
    assert "BroadcastHashJoin [_cur" in plan or "SortMergeJoin [_cur" in plan
    assert "BroadcastHashJoin [_prev" in plan or "SortMergeJoin [_prev" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dq_row_predicates_share_one_scan(spark, sf_small):
    """All row-predicate constraints ride ONE aggregation pass over the
    table — physically: the wide 1-row aggregate is fenced, so the
    per-constraint report rows do not each re-run the scan."""
    from mlx_vector_db_spark.operators.dq import Check, dq_audit

    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    rep = dq_audit(
        li,
        Check(
            completeness=["l_orderkey"],
            in_range={"l_discount": (0.0, 0.05)},
            accepted_values={"l_returnflag": ["A", "R"]},
        ),
    )
    plan = explain_str(rep)
    assert plan.count("Scan parquet") <= 1  # post-fence: scan appears once at most
    rep.collect()  # and it actually runs


def test_mixture_sample_is_filter_plus_broadcast(spark, sf_small):
    """plan_mixture's sample side: one availability aggregate, the
    stratum-sized plan broadcasts, and the corpus is never shuffled."""
    from mlx_vector_db_spark.operators.sampling import plan_mixture

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    _, sampled = plan_mixture(docs, {"src1": 100.0}, weight_col="n_chars")
    plan = explain_str(sampled)
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the avail agg only
