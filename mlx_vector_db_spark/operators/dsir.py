"""Data Selection with Importance Resampling (DSIR) over hashed n-grams.

Xie et al., "Data Selection for Language Models via Importance
Resampling" (NeurIPS 2023): pick pretraining documents from a raw pool
so the SELECTED distribution matches a small trusted target corpus.
Both corpora are summarized as bag-of-hashed-n-gram distributions; each
raw document gets an importance log-weight

    log w(x) = sum_{gram g in x} [ log p_target(bucket(g))
                                   - log q_raw(bucket(g)) ]

and the selection draws without replacement proportionally to w via the
Gumbel-top-k trick.  The reference engine has no data-selection surface
at all (its ingestion is take-everything, ``api/routes/vectors.py``);
this is the standard curation step that feeds such a store at 100 TB.

Everything is engine-portable and deterministic:

- features are :func:`~mlx_vector_db_spark.operators.quality.
  hashed_feature_buckets` (md5-bucketed word 1..n-grams — identical ids
  in Spark, DuckDB, Python);
- both bucket distributions are Laplace-smoothed over the SAME fixed
  bucket space, so unseen buckets are well-defined on either side;
- the Gumbel noise derives from :func:`~mlx_vector_db_spark.operators.
  sampling.sample_key` (md5 of the doc id), not RNG state — the same
  documents are selected on every engine, cluster size, and retry, and
  the whole pipeline is expressible as a SQL oracle.

Scale shape (the part that matters at 100 TB): each corpus is reduced
to AT MOST ``n_buckets`` rows by one map-side-combinable aggregation;
the two distributions full-outer-join into a ratio table of
``n_buckets`` rows (a 8k-bucket table is ~100 KB) that AQE broadcasts;
scoring is explode -> broadcast-probe -> one doc-keyed aggregation.  No
shuffle is ever keyed by anything larger than the corpus' doc ids, and
the only state that grows with corpus size is the per-doc output row.
The final top-n is ORDER BY + LIMIT — Spark plans a
``TakeOrderedAndProject`` (per-partition heap + driver merge of n·P
rows), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.quality import hashed_feature_buckets
from mlx_vector_db_spark.operators.sampling import sample_key
from mlx_vector_db_spark.rebalance import (
    HEAVY_KERNEL_SPLIT_BYTES,
    rebalance_for_compute,
)

__all__ = ["dsir_log_weights", "dsir_resample", "gumbel_key"]


def gumbel_key(id_col, salt: str = "dsir"):
    """Deterministic Gumbel(0,1) noise for the Gumbel-top-k sampler:
    ``-ln(-ln(u))`` with ``u`` the md5 uniform of the row id, clamped
    one half-grid-step away from {0, 1} (sample_key's 32-bit grid makes
    u=0 a real, if rare, value and -ln(-ln(0)) is -inf)."""
    u = sample_key(id_col, salt)
    eps = F.lit(1.0 / float(1 << 33))
    u = F.least(F.greatest(u, eps), F.lit(1.0) - eps)
    return -F.log(-F.log(u))


def _bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int, ngram_max: int, out: str
) -> DataFrame:
    """(bucket, count) over all gram occurrences of a corpus — bounded
    at ``n_buckets`` rows regardless of corpus size."""
    return (
        # parallelism guard: the md5 gram hashing is the operator's
        # dominant per-row cost (~80%, BENCH_r13_dsir_profile_sf1) and
        # runs in the SCAN stage — a single-file corpus serializes it
        # onto one core (measured r13: the whole pass on 1 of 32 tasks).
        # No-op on any real wide table.
        rebalance_for_compute(df, text_col, split_bytes=HEAVY_KERNEL_SPLIT_BYTES)
        .select(
            F.explode(hashed_feature_buckets(text_col, n_buckets, ngram_max)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias(out))
    )


def dsir_log_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    n_buckets: int = 1 << 13,
    ngram_max: int = 2,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance log-weights of ``raw_df`` against
    ``target_df``.

    Returns ``(id_col, n_grams, log_weight)``; documents with zero
    tokens are absent (no features — the caller decides their fate).

    Laplace smoothing with pseudo-count ``alpha`` over the fixed bucket
    space ``B = n_buckets``::

        p(b) = (target_count(b) + alpha) / (target_total + alpha * B)
        q(b) = (raw_count(b)    + alpha) / (raw_total    + alpha * B)

    so buckets unseen in the target (or raw) corpus still carry finite
    log-probabilities, and ``log_weight`` is a finite sum for every
    document.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2 (got {n_buckets})")
    if alpha <= 0.0:
        raise ValueError(f"alpha must be > 0 (got {alpha})")

    t_counts = _bucket_counts(target_df, text_col, n_buckets, ngram_max, "t_c")
    # materialize the raw corpus' (doc, bucket) features ONCE: both the
    # q-distribution and the scoring pass consume them, and the md5
    # gram hashing is the dominant per-row cost — without the fence it
    # runs twice over the full raw corpus
    feats = (
        # same parallelism guard as _bucket_counts: hash on every core
        rebalance_for_compute(
            raw_df, id_col, text_col, split_bytes=HEAVY_KERNEL_SPLIT_BYTES
        )
        .select(
            F.col(id_col),
            F.explode(hashed_feature_buckets(text_col, n_buckets, ngram_max)).alias(
                "bucket"
            ),
        )
        .localCheckpoint(eager=False)
    )
    q_counts = feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("q_c"))

    # n_buckets-row ratio table; the totals ride 1-row broadcast cross
    # joins (the unigram-LM pattern), never a driver collect
    t_tot = t_counts.agg(F.sum("t_c").alias("t_tot"))
    q_tot = q_counts.agg(F.sum("q_c").alias("q_tot"))
    a = F.lit(float(alpha))
    b = F.lit(float(n_buckets))
    ratio = (
        t_counts.join(q_counts, "bucket", "full_outer")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(q_tot))
        .select(
            "bucket",
            (
                F.log(F.coalesce(F.col("t_c"), F.lit(0)).cast("double") + a)
                - F.log(F.coalesce(F.col("t_tot"), F.lit(0)).cast("double") + a * b)
                - F.log(F.coalesce(F.col("q_c"), F.lit(0)).cast("double") + a)
                + F.log(F.coalesce(F.col("q_tot"), F.lit(0)).cast("double") + a * b)
            ).alias("_ratio"),
        )
    )

    # a bucket a scored doc emits is by construction present in q_counts
    # (built from raw_df itself); the left join + coalesce keeps the
    # operator total when callers score a DIFFERENT frame against the
    # fitted pair, where a truly-unseen bucket means t_c = q_c = 0 and
    # the ratio reduces to log((q_tot+aB)/(t_tot+aB))
    unseen = F.log(
        (F.coalesce(F.col("q_tot"), F.lit(0)).cast("double") + a * b)
        / (F.coalesce(F.col("t_tot"), F.lit(0)).cast("double") + a * b)
    )
    scored = feats.join(F.broadcast(ratio), "bucket", "left").crossJoin(
        F.broadcast(t_tot.crossJoin(q_tot))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(F.coalesce(F.col("_ratio"), unseen)).alias("log_weight"),
    )


def dsir_resample(
    raw_df: DataFrame,
    target_df: DataFrame,
    n: int,
    n_buckets: int = 1 << 13,
    ngram_max: int = 2,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    gumbel: bool = True,
    salt: str = "dsir",
) -> DataFrame:
    """Select ``n`` documents from ``raw_df`` by DSIR importance.

    ``gumbel=True`` (the paper's sampler) draws WITHOUT replacement
    proportionally to ``w(x)`` via the Gumbel-top-k identity: rank by
    ``log w(x) + G_x`` where ``G_x = -ln(-ln(u_x))`` and ``u_x`` is the
    deterministic md5 uniform of the doc id — reproducible noise, no
    RNG state.  ``gumbel=False`` takes the top-``n`` by raw weight
    (the hard-selection variant the paper ablated).

    Returns ``(id_col, n_grams, log_weight, sel_key)`` for the selected
    rows, ordered by ``sel_key`` descending (ties broken by id).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1 (got {n})")
    weights = dsir_log_weights(
        raw_df,
        target_df,
        n_buckets=n_buckets,
        ngram_max=ngram_max,
        alpha=alpha,
        text_col=text_col,
        id_col=id_col,
    )
    if gumbel:
        key = F.col("log_weight") + gumbel_key(id_col, salt)
    else:
        key = F.col("log_weight")
    return (
        weights.withColumn("sel_key", key)
        .orderBy(F.col("sel_key").desc(), F.col(id_col))
        .limit(n)
    )
