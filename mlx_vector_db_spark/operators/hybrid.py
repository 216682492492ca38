"""Hybrid retrieval: BM25 keyword scoring + reciprocal-rank fusion.

The reference engine is vector-only — its query surface is k-NN over
embeddings (api/routes/vector_v1.py, performance/mlx_optimized.py).
Modern vector stores pair that with a keyword arm and fuse the two
rankings; this module adds both halves as DataFrame operators:

- :func:`bm25_scores` / :func:`bm25_topk` — Okapi BM25 over a token
  column, entirely in JVM expressions (no UDF);
- :func:`rrf_fuse` — reciprocal-rank fusion (Cormack et al., SIGIR'09:
  ``score(d) = Σ_arms 1/(k0 + rank_arm(d))``), the standard
  training-free fusion of heterogeneous rankings.

Scale design (100 TB):
- BM25's only corpus-sized shuffle is the (doc, term) partial-count —
  map-side combinable, and the explode is filtered to the query's
  terms BEFORE the shuffle, so shuffled volume is O(matching tokens),
  not O(corpus tokens). Document length rides through the same
  aggregate (``first(dl)``) instead of a second corpus join. The
  per-term document frequencies and the global (N, avgdl) scalars are
  tiny aggregates, broadcast back.
- RRF joins the arms' top-k lists — k rows per arm by construction, so
  fusion cost is independent of corpus size; the arms' own plans carry
  the scale story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlx_vector_db_spark.functions.text import tokens
from mlx_vector_db_spark.operators.topk import bounded_global_rank
from mlx_vector_db_spark.rebalance import (
    LIGHT_KERNEL_SPLIT_BYTES,
    rebalance_for_compute,
)

__all__ = ["bm25_scores", "bm25_topk", "rrf_fuse"]


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 score of every document matching at least one query
    term. Uses the Lucene-style non-negative idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``; ``k1``/``b`` are the usual
    saturation / length-normalization knobs.

    Returns ``(id_col, score)``; documents matching no term are absent
    (their score is 0 by definition).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    terms = [t.lower() for t in terms]
    toks = F.transform(tokens(text_col), lambda w: F.lower(w))

    # parallelism guard: tokenize + lowercase + the term-filter explode
    # are the per-row cost and otherwise run in the scan stage — one
    # core on a single-file corpus. No-op on a real wide table.
    base = (
        rebalance_for_compute(
            docs, id_col, text_col, split_bytes=LIGHT_KERNEL_SPLIT_BYTES
        )
        .select(F.col(id_col), toks.alias("_toks"))
        .select(id_col, "_toks", F.size("_toks").alias("_dl"))
    )
    # global scalars (N, avgdl) as a broadcast single-row aggregate —
    # stays in-plan, no driver round-trip
    stats = base.agg(
        F.count("*").cast("double").alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
    )
    # filter to query terms BEFORE the explode, not merely before the
    # shuffle: explode-then-filter materializes one row per CORPUS
    # token (~30M Generate rows at sf10 for a 4-term query) and lets
    # the filter discard >99.9% of them, while filtering the array
    # first keeps the Generate's output to O(matching tokens). The
    # groupBy shuffle input is identical either way; the Generate
    # volume is the part that amplified host-memory weather into 8x
    # wall swings on this query (r10 adjudication, SCALE.md).
    tf = (
        base.select(
            id_col,
            "_dl",
            F.explode(
                F.filter("_toks", lambda w: w.isin(*terms))
            ).alias("_term"),
        )
        .groupBy(id_col, "_term")
        .agg(F.count("*").alias("_tf"), F.first("_dl").alias("_dl"))
    )
    dft = tf.groupBy("_term").agg(F.count("*").alias("_dft"))

    scored = (
        tf.join(F.broadcast(dft), "_term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("_n_docs") - F.col("_dft") + F.lit(0.5))
                / (F.col("_dft") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_contrib",
            F.col("_idf")
            * (F.col("_tf") * F.lit(k1 + 1.0))
            / (
                F.col("_tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("_dl") / F.col("_avgdl")
                )
            ),
        )
    )
    return scored.groupBy(id_col).agg(F.sum("_contrib").alias("score"))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_scores: int | None = None,
) -> DataFrame:
    """Top-``k`` BM25 documents with a deterministic ``rank`` column
    (score descending, id ascending on ties). A global ORDER BY LIMIT k
    — Spark plans it as TakeOrderedAndProject (per-partition partial
    top-k, no full sort).

    ``round_scores`` rounds the score to that many decimals BEFORE
    ranking: two documents whose term contributions are the same
    multiset can sum in different orders (1-ulp drift), and rounding
    first makes the (score, id) order reproducible across engines —
    required when the ranking is compared against an external oracle.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    scored = bm25_scores(docs, terms, text_col, id_col, k1, b)
    if round_scores is not None:
        scored = scored.withColumn("score", F.round("score", round_scores))
    order = [F.col("score").desc(), F.col(id_col)]
    # global ORDER BY LIMIT k first (plans as TakeOrderedAndProject:
    # per-partition partial top-k, no single-partition WindowExec), then
    # a positional rank over the already-k-row survivors
    topk = scored.orderBy(*order).limit(int(k))
    return bounded_global_rank(topk, order).select(id_col, F.col("score"), "rank")


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str = "id",
    rank_col: str = "rank",
    k0: int = 60,
    round_scores: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of named rankings:
    ``rrf_score(d) = Σ_arms 1/(k0 + rank_arm(d))`` summed over the arms
    where ``d`` appears. ``k0`` (60 in the original paper) damps the
    head of each list.

    Each input needs columns ``(id_col, rank_col)``. Returns
    ``(id_col, rrf_score, n_arms)`` for every id in any arm, plus a
    deterministic fused ``rank`` (rrf_score desc, id asc);
    ``round_scores`` rounds before ranking (see :func:`bm25_topk`).
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    parts = []
    for arm, df in rankings.items():
        parts.append(
            df.select(
                F.col(id_col),
                (F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col))).alias("_r"),
            )
        )
    allarms = parts[0]
    for p in parts[1:]:
        allarms = allarms.unionByName(p)
    fused = allarms.groupBy(id_col).agg(
        F.sum("_r").alias("rrf_score"), F.count("*").alias("n_arms")
    )
    if round_scores is not None:
        fused = fused.withColumn("rrf_score", F.round("rrf_score", round_scores))
    # fused is bounded by construction (<= k rows per input arm), so the
    # single-group rank moves only those rows
    return bounded_global_rank(
        fused, [F.col("rrf_score").desc(), F.col(id_col)]
    )
