"""Corpus-quality operators for LLM training-data pipelines:
Gopher-style repetition signals and n-gram train/eval contamination.

These extend the reference's surface (it has no corpus-filtering story
— its pipeline stops at chunk/embed, integrations/mlx_lm_pipeline.py)
with the two filters every large-scale text pipeline runs before
training: repetition-based quality scoring (Rae et al., "Scaling
Language Models: ... Gopher", §A.1.1) and n-gram overlap
decontamination of the training set against an eval set (Brown et
al., GPT-3 appendix C).

Scale design (100 TB):
- ``repetition_signals`` is ONE explode followed by two hash
  aggregations, both map-side combinable; nothing is ever keyed by a
  whole document's text, only by (doc_id, gram), so a pathological
  giant document spreads over its distinct grams rather than one
  reducer.
- ``ngram_contamination`` hashes grams to 64-bit before the join, so
  the shuffled payload is (id, long) rather than raw n-gram strings;
  the eval side is deduplicated before joining and is typically small
  enough for a broadcast hash join (eval sets are ~1e3-1e6 grams while
  the training corpus is the 100 TB side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mlx_vector_db_spark.functions.text import tokens
from mlx_vector_db_spark.rebalance import (
    LIGHT_KERNEL_SPLIT_BYTES,
    rebalance_for_compute,
)

__all__ = [
    "repetition_signals",
    "repeated_spans",
    "ngram_contamination",
    "word_ngrams",
    "word_ngrams_from_tokens",
    "hashed_word_ngrams",
    "ngrams_from_word_hashes",
    "winnow_fingerprints",
    "winnow_crossdoc_pairs",
    "unigram_lm_scores",
    "bigram_lm_scores",
    "calibrate_keep_threshold",
    "hashed_feature_buckets",
    "hashed_linear_score",
]


def word_ngrams_from_tokens(toks: Column, n: int) -> Column:
    """:func:`word_ngrams` over an already-tokenized (and MATERIALIZED)
    ``array<string>`` column — the chain references the token array ~n
    times, which re-evaluates an inline ``tokens()`` subtree n-fold
    (array expressions evaluate outside codegen CSE)."""
    if n < 1:
        raise ValueError(f"n must be >= 1 (got {n})")
    sz = F.size(toks)
    width = sz - F.lit(n - 1)
    out = F.slice(toks, 1, F.greatest(width, F.lit(0)))
    for j in range(1, n):
        out = F.zip_with(
            out,
            F.slice(toks, 1 + j, F.greatest(width, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(sz >= n, out).otherwise(F.array().cast("array<string>"))


def word_ngrams(col: Column | str, n: int) -> Column:
    """Space-joined word ``n``-grams of a text column as
    ``array<string>`` (empty when the document has fewer than ``n``
    words). Expression form — corpus-scale operators should tokenize in
    their own projection and use :func:`word_ngrams_from_tokens`."""
    return word_ngrams_from_tokens(tokens(col), n)


def ngrams_from_word_hashes(h: Column, sz: Column, n: int) -> Column:
    """Chained n-gram hashes from a MATERIALIZED word-hash array ``h``
    (+ its size ``sz``): ``h_gram = xxhash64(h_prefix, h_word)`` zipped
    over shifted slices — no gram string is ever built. Pass attribute
    columns from a prior projection, not inline expressions: each
    ``slice`` references ``h`` once, and n-gram chaining references it
    ``n`` times, which re-evaluates an inline subtree n-fold (HOF/array
    expressions evaluate outside codegen CSE)."""
    if n < 1:
        raise ValueError(f"n must be >= 1 (got {n})")
    width = F.greatest(sz - F.lit(n - 1), F.lit(0))
    out = F.slice(h, 1, width)
    for j in range(1, n):
        out = F.zip_with(
            out,
            F.slice(h, 1 + j, width),
            lambda a, b: F.xxhash64(a, b),
        )
    return F.when(sz >= n, out).otherwise(F.array().cast("array<long>"))


def hashed_word_ngrams(col: Column | str, n: int) -> Column:
    """64-bit hashes of word ``n``-grams as ``array<long>`` — the shuffle
    representation. Words are xxhash64-ed once, then n-grams are built by
    CHAINING hashes (``h_gram = xxhash64(h_prefix, h_word)``) instead of
    concatenating strings, so no gram string is ever materialized; the
    downstream shuffle moves 8-byte longs. Counting/joining on these is
    exact up to 64-bit collisions (~2^-64 per pair).

    Expression form — tokenizes and hashes inline, so the chain
    re-evaluates the word-hash subtree ~n times; corpus-scale operators
    materialize the word-hash array and use
    :func:`ngrams_from_word_hashes` instead."""
    toks = tokens(col)
    return ngrams_from_word_hashes(
        F.transform(toks, lambda w: F.xxhash64(w)), F.size(toks), n
    )


def _run_length_stats(grams: Column) -> Column:
    """Repetition stats of a hashed-gram array WITHOUT any shuffle:
    sort the hashes, then one `aggregate` pass over the runs of equal
    values. Returns struct(mx, dup, n): the largest run (= count of the
    most frequent gram), the total mass of runs longer than 1 (= slots
    occupied by any repeated gram), and the gram count."""
    h = F.array_sort(grams)
    init = F.struct(
        F.lit(None).cast("long").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("mx"),
        F.lit(0).cast("long").alias("dup"),
    )

    def step(acc: Column, x: Column) -> Column:
        closing_mx = F.greatest(acc["mx"], acc["run"])
        closing_dup = acc["dup"] + F.when(acc["run"] > 1, acc["run"]).otherwise(
            F.lit(0)
        )
        return F.when(
            x.eqNullSafe(acc["prev"]),
            F.struct(
                acc["prev"].alias("prev"),
                (acc["run"] + 1).alias("run"),
                acc["mx"].alias("mx"),
                acc["dup"].alias("dup"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                closing_mx.alias("mx"),
                closing_dup.alias("dup"),
            )
        )

    def finish(acc: Column) -> Column:
        return F.struct(
            F.greatest(acc["mx"], acc["run"]).alias("mx"),
            (
                acc["dup"]
                + F.when(acc["run"] > 1, acc["run"]).otherwise(F.lit(0))
            ).alias("dup"),
            F.size(h).cast("long").alias("n"),
        )

    return F.aggregate(h, init, step, finish)


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document repetition statistics (the Gopher repetition
    rules, word-level):

    - ``top_word_frac``   — occurrences of the most frequent word
      / total words,
    - ``top_bigram_frac`` — occurrences of the most frequent word
      bigram / total bigrams,
    - ``dup_trigram_frac``— fraction of trigram slots occupied by a
      trigram that appears more than once.

    A pipeline drops documents where these exceed thresholds (Gopher
    uses 0.2 / 0.18 / [0.30 for dup 2-grams]); the operator returns
    the raw signals so the cut stays a cheap post-filter.

    Physical plan: MAP-ONLY, Arrow-batched mapInPandas, ZERO shuffles —
    embarrassingly parallel over whatever partitioning the caller set
    (wrap in ``rebalance_for_compute`` for under-partitioned inputs).
    This is the MEASURED winner of three implementations: v1 exploded a
    kind-tagged gram union into a (doc, kind, gram) aggregation (two
    shuffles of ~3x grams-per-corpus rows, 2.3x slower at sf0.1); v2
    (r4-r5) stayed JVM-side with per-doc `array_sort` of chained
    64-bit gram hashes plus run-length `aggregate` HOFs — but Catalyst
    evaluates lambda HOFs interpreted, outside whole-stage codegen, and
    the three sorts dominated: the Arrow path with per-doc hash-map
    counting measures 2.9x faster at sf1 (0.9s vs 2.6s) and 10x at
    sf10 (2.3s vs 22.8s, 500k docs), scaling at-or-below linear across
    both decades. Gram counting is exact string tuples (no 64-bit hash
    collisions). Per-doc memory is O(doc grams), the same order as the
    text column itself.

    Tokenization matches :func:`~mlx_vector_db_spark.functions.text.
    tokens` byte-for-byte: ASCII-whitespace split of the trimmed text
    (``re.ASCII`` — Java/RE2 ``\\s`` does not match U+00A0 etc.), empty
    or NULL text -> no tokens. The fractions are divided in Python
    (IEEE doubles, same result as the JVM division) and rounded JVM-
    side with ``F.round`` so oracle parity is preserved exactly.
    Documents shorter than 2 (resp. 3) words report 0.0 for the
    bigram (trigram) signals.
    """
    import re as _re

    import pandas as pd

    _ws = _re.compile(r"\s+", _re.ASCII)
    out_schema = (
        f"{id_col} long, _tw double, _tb double, _tt double"
    )

    def gen(batches):
        from collections import Counter

        for pdf in batches:
            tw: list[float] = []
            tb: list[float] = []
            tt: list[float] = []
            for text in pdf[text_col]:
                s = (text or "").strip(" \t\n\r\f\v")
                words = _ws.split(s) if s else []
                n = len(words)
                if n == 0:
                    tw.append(0.0)
                    tb.append(0.0)
                    tt.append(0.0)
                    continue
                cw = Counter(words)
                tw.append(max(cw.values()) / n)
                if n < 2:
                    tb.append(0.0)
                else:
                    cb = Counter(zip(words, words[1:]))
                    tb.append(max(cb.values()) / (n - 1))
                if n < 3:
                    tt.append(0.0)
                else:
                    ct = Counter(zip(words, words[1:], words[2:]))
                    tt.append(
                        sum(v for v in ct.values() if v > 1) / (n - 2)
                    )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "_tw": tw, "_tb": tb, "_tt": tt}
            )

    out = df.select(id_col, text_col).mapInPandas(gen, schema=out_schema)
    return out.select(
        F.col(id_col),
        F.round("_tw", 6).alias("top_word_frac"),
        F.round("_tb", 6).alias("top_bigram_frac"),
        F.round("_tt", 6).alias("dup_trigram_frac"),
    )


def repeated_spans(
    df: DataFrame,
    n: int = 6,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicate-span mining (the Lee et al.,
    "Deduplicating Training Data Makes Language Models Better" shape,
    word-level): word ``n``-grams that occur in at least ``min_docs``
    distinct documents, with corpus-wide document and occurrence
    counts. A pipeline uses the result as a boilerplate/contamination
    lexicon — to strip the spans, to stop-list them before MinHash, or
    to flag template-heavy sources.

    Output: ``gram, n_docs, n_occurrences`` (n_docs >= min_docs).

    Scale: the word-count shape — one explode, one hash aggregation on
    the gram with map-side partial aggregation (count_distinct plans as
    a two-phase expand+agg). The gram strings themselves are the
    shuffle key here because they ARE the result; a count-only variant
    should group on :func:`hashed_word_ngrams` output instead and
    shuffle 8-byte longs.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1 (got {n})")
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1 (got {min_docs})")
    from mlx_vector_db_spark.rebalance import (
        LIGHT_KERNEL_SPLIT_BYTES,
        rebalance_for_compute,
    )

    g = (
        rebalance_for_compute(
            df, id_col, text_col, split_bytes=LIGHT_KERNEL_SPLIT_BYTES
        )
        # materialized token projection — see word_ngrams_from_tokens
        .select(F.col(id_col).alias("_id"), tokens(text_col).alias("_toks"))
        .select(
            "_id",
            F.explode(word_ngrams_from_tokens(F.col("_toks"), n)).alias("gram"),
        )
    )
    return (
        g.groupBy("gram")
        .agg(
            F.count_distinct("_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= F.lit(int(min_docs)))
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 4,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS rolling-hash scheme, word-level): hash every
    word ``k``-gram, slide a window of ``w`` consecutive hashes, keep
    each window's minimum. Guarantee: two documents sharing any run of
    ``w + k - 1`` words share at least one fingerprint, while only
    ~``2/(w+1)`` of gram hashes are kept — a compact sketch for
    containment/plagiarism-style matching that exact-dup hashing and
    MinHash (whole-doc resemblance) both miss.

    Returns exploded ``(id_col, fingerprint)`` rows (distinct per doc).
    Documents with at least one word but fewer than ``w`` grams emit
    the single global-min fingerprint; empty documents emit nothing.

    Scale: everything up to the explode is per-row whole-stage codegen
    (no UDF, NO shuffle — O(m·w) work per doc with small constant w).
    Gram hashes are the first 8 md5 hex digits, so any engine
    reproduces the exact fingerprint values (the portability trick
    :func:`~mlx_vector_db_spark.operators.sampling.sample_key` uses).

    The gram-hash array is materialized in its own projection before
    the sliding-min pass. Inlining it into the per-window lambda makes
    Catalyst re-evaluate the whole md5 transform for EVERY window index
    (codegen CSE does not reach inside higher-order-function lambdas) —
    O(m²) hashing, measured 50× slower at 500 docs. CollapseProject
    keeps the two projections separate because the array is non-cheap
    and multiply referenced.
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1 (got k={k}, w={w})")
    grams = word_ngrams(text_col, k)
    hashed = df.select(
        F.col(id_col),
        F.transform(
            grams,
            lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
        ).alias("_gram_hashes"),
    )
    h = F.col("_gram_hashes")
    m = F.size(h)
    nwin = m - F.lit(w - 1)
    windowed = F.transform(
        F.sequence(F.lit(1), F.greatest(nwin, F.lit(1))),
        lambda i: F.array_min(F.slice(h, i, F.least(F.lit(w), m))),
    )
    fps = (
        F.when(m <= 0, F.array().cast("array<long>"))
        .when(nwin >= 1, windowed)
        .otherwise(F.array(F.array_min(h)))
    )
    return hashed.select(
        F.col(id_col), F.explode(F.array_distinct(fps)).alias("fingerprint")
    )


def winnow_crossdoc_pairs(
    df: DataFrame,
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_fp_docs: int | str | None = "auto",
    text_col: str = "text",
    id_col: str = "doc_id",
    autocap_pair_budget: int = 128,
) -> DataFrame:
    """Cross-document shared-span pair mining on winnowing fingerprints
    (the MOSS match step, Schleimer et al. SIGMOD'03 §4): equi-join the
    per-doc fingerprint sets of :func:`winnow_fingerprints` on the
    fingerprint value and count, per unordered doc pair, how many
    fingerprints they share. By the winnowing guarantee, a pair sharing
    any verbatim run of ``w + k - 1`` words surfaces with
    ``n_shared >= 1`` — this finds CONTAINMENT (a paragraph lifted into
    an otherwise-different document) that whole-doc resemblance
    sketches (MinHash/SimHash) and exact-dup hashing both miss.

    Returns ``(doc_a, doc_b, n_shared)`` with ``doc_a < doc_b`` and
    ``n_shared >= min_shared`` (raising ``min_shared`` trades recall on
    short overlaps for precision against chance hash collisions).

    Scale (100 TB): the only shuffles are keyed by fingerprint (the
    self-join) and by the pair — never by the corpus. The quadratic
    failure mode is a HOT fingerprint (license boilerplate present in f
    docs contributes f² join rows); ``max_fp_docs`` drops fingerprints
    whose document frequency exceeds the cap *before* the self-join via
    a broadcast anti-join against the aggregated hot list — the same
    bounded-fan-out contract as ``max_shingle_freq`` on
    :func:`~mlx_vector_db_spark.operators.dedup.jaccard_pairs` (capped
    output is a subset of uncapped; ``n_shared`` for a surviving pair
    is an under-count of its true overlap, never an over-count).
    ``"auto"`` derives the cap from the FINGERPRINT-DF DISTRIBUTION
    with the shared fan-out-budget rule
    (:func:`~mlx_vector_db_spark.operators.dedup.fanout_autocap`):
    the largest DF whose cumulative candidate-pair mass stays within
    ``autocap_pair_budget`` pairs per document, clamped to [4, 1024] —
    linear total join work by construction, replica families up to
    ~sqrt(2*budget) docs kept (see the rule's rationale in
    operators/dedup.py; the r6 ``ceil(n/200)`` rule it replaces went
    quadratic on replica-family corpora).

    Precondition: ``id_col`` unique (it is the document key) —
    fingerprints are distinct per doc, so the pair count equals the
    shared-set size only when each doc appears once.
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1 (got {min_shared})")
    fps = winnow_fingerprints(df, k=k, w=w, text_col=text_col, id_col=id_col)
    auto_cap = False
    if isinstance(max_fp_docs, str):
        if max_fp_docs != "auto":
            raise ValueError(
                f"max_fp_docs must be an int, None, or 'auto' "
                f"(got {max_fp_docs!r})"
            )
        auto_cap = True
        max_fp_docs = None
    # fingerprints feed the df aggregate AND both join sides —
    # truncate lineage so the md5/window-min transform runs once
    fps = fps.localCheckpoint(eager=False)
    if auto_cap or max_fp_docs is not None:
        # semi-join against the kept band 2 <= df <= cap: the df >= 2
        # bound is free pruning with zero output change (a df-1
        # fingerprint meets only itself; doc_a < doc_b discards it),
        # and hapax fingerprints dominate on real corpora — same
        # rationale as the jaccard_pairs kept-band filter
        dfreq = fps.groupBy("fingerprint").agg(
            F.count(F.lit(1)).alias("_df")
        )
        if auto_cap:
            from mlx_vector_db_spark.operators.dedup import fanout_autocap

            # cap derivation and kept band share one materialized
            # DF aggregate (in-plan knee tried r14, measured par to
            # slower — see the jaccard_pairs note; reverted)
            dfreq = dfreq.localCheckpoint(eager=False)
            max_fp_docs = fanout_autocap(dfreq, df.count(), autocap_pair_budget)
        kept = (
            dfreq.where(
                (F.col("_df") >= F.lit(2))
                & (F.col("_df") <= F.lit(int(max_fp_docs)))
            )
            .select("fingerprint")
            # materialize once for both join sides
            .localCheckpoint(eager=False)
        )
        fps = fps.join(kept, on="fingerprint", how="left_semi")
    a = fps.select(F.col(id_col).alias("doc_a"), "fingerprint")
    b = fps.select(F.col(id_col).alias("doc_b"), "fingerprint")
    return (
        a.join(b, on="fingerprint")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= F.lit(int(min_shared)))
    )


def hashed_feature_buckets(
    col: Column | str, n_buckets: int = 1 << 16, ngram_max: int = 2
) -> Column:
    """fastText-style hashed feature ids: word 1..``ngram_max``-grams
    bucketed into ``n_buckets`` via the first 8 md5 hex digits (the
    engine-portable hash — any engine reproduces the exact bucket ids,
    unlike xxhash64). Returns ``array<int>`` with one entry per gram
    occurrence (counts matter for the mean-pool, so no dedup)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2 (got {n_buckets})")
    if ngram_max < 1:
        raise ValueError(f"ngram_max must be >= 1 (got {ngram_max})")
    grams = word_ngrams(col, 1)
    for n in range(2, ngram_max + 1):
        grams = F.concat(grams, word_ngrams(col, n))
    return F.transform(
        grams,
        lambda g: (
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
            % F.lit(n_buckets)
        ).cast("int"),
    )


def hashed_linear_score(
    df: DataFrame,
    weights: DataFrame,
    n_buckets: int = 1 << 16,
    ngram_max: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    bias: float = 0.0,
    broadcast_weights: bool = True,
) -> DataFrame:
    """Linear quality classifier over hashed n-gram features — the
    fastText/CCNet document-scoring shape (Joulin et al. 2016; CCNet
    uses exactly this to rank CommonCrawl against Wikipedia):
    ``score = sigmoid(mean(w[bucket]) + bias)`` over all gram
    occurrences of the document.

    ``weights`` is a ``(bucket int, weight double)`` DataFrame — a
    trained model imported as data, not code. Buckets absent from
    ``weights`` contribute weight 0 (a sparse model over a dense
    feature space).

    Returns ``(id_col, n_feats, score)``; documents with zero tokens
    are absent (no features to score — the caller decides their fate).

    Scale: features explode to (doc, int) pairs; the weight table is
    at most ``n_buckets`` rows (a 64k-bucket model is ~1 MB) and is
    broadcast, so scoring a 100 TB corpus is a map-side hash probe
    plus ONE per-doc aggregation — no shuffle of anything doc-sized.
    """
    feats = df.select(
        F.col(id_col),
        F.explode(hashed_feature_buckets(text_col, n_buckets, ngram_max)).alias(
            "bucket"
        ),
    )
    w = weights.select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("weight").cast("double").alias("weight"),
    )
    if broadcast_weights:
        w = F.broadcast(w)
    joined = feats.join(w, "bucket", "left")
    mean_w = F.avg(F.coalesce(F.col("weight"), F.lit(0.0)))
    z = mean_w + F.lit(float(bias))
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_feats"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("score"),
    )


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Training documents that share at least one word ``n``-gram with
    the eval set (GPT-3-style decontamination; the classic setting is
    13-grams on web-scale text — pick ``n`` for your document length).

    Returns one row per contaminated training document:
    ``(id_col, n_shared_grams)`` where ``n_shared_grams`` counts the
    DISTINCT n-grams of that document that also occur anywhere in the
    eval set. Clean documents are absent — the caller anti-joins to
    keep them.

    Scale: grams are deduplicated per document (``array_distinct``)
    BEFORE the explode, then hashed to 64-bit, so the join shuffles
    (id, long) pairs; the eval gram set is globally deduplicated and
    broadcast when ``broadcast_eval`` (an eval suite is tiny next to a
    training corpus — the join becomes a map-side hash probe with NO
    shuffle of the training side beyond the final per-doc count).
    xxhash64 collisions are the usual 2^-64 caveat and can only
    overcount, never miss a true overlap.
    """

    def grams(df: DataFrame) -> DataFrame:
        # word-hash array materialized first — see ngrams_from_word_hashes
        toks = tokens(text_col)
        hdf = df.select(
            F.col(id_col),
            F.transform(toks, lambda w: F.xxhash64(w)).alias("_wh"),
            F.size(toks).alias("_sz"),
        )
        gr = ngrams_from_word_hashes(F.col("_wh"), F.col("_sz"), n)
        return hdf.select(
            F.col(id_col), F.explode(F.array_distinct(gr)).alias("gh")
        )

    ev = grams(eval_df).select("gh").distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        grams(train)
        .join(ev, "gh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_grams"))
    )


def unigram_lm_scores(
    df: DataFrame,
    ref_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Unigram language-model quality signal (the CCNet shape, Wenzek
    et al. 2020: score candidate documents by perplexity under an LM
    trained on a trusted reference corpus; high-perplexity docs are
    gibberish/boilerplate candidates, suspiciously-low ones are
    repetitive).

    The LM is a Laplace-smoothed unigram model over lowercased
    whitespace tokens of ``ref_df`` (default: ``df`` itself —
    self-perplexity ranks outliers against the corpus' own
    distribution):

        P(tok) = (count(tok) + alpha) / (total + alpha * (V + 1))

    with V the reference vocabulary size and one extra smoothing slot
    standing in for ALL out-of-vocabulary tokens (every OOV token
    shares P = alpha / denom). Output per input document: ``n_tokens``,
    ``avg_nll`` (mean negative log-probability, natural log) and
    ``perplexity`` = exp(avg_nll); empty/NULL-text documents report
    NULLs (no tokens to score).

    Scale shape: three keyed shuffles, none keyed by the corpus —
    (1) the LM build aggregates (token -> count), map-side combinable;
    (2) scoring joins doc tokens to the LM on the token (the LM side is
    vocabulary-sized — AQE broadcasts it when small);
    (3) the per-doc mean aggregates on the doc id. The two scalar
    totals ride a 1-row broadcast cross join, never a driver collect.
    A giant document spreads over its tokens, never one reducer.
    """
    lower_toks = tokens(F.lower(F.col(text_col)))
    ref = ref_df if ref_df is not None else df
    # parallelism guard on BOTH tokenize+explode passes: the per-row
    # lowercase/split/explode work otherwise runs in the scan stage —
    # a single-file corpus serializes it onto one core (measured r13 on
    # the dsir md5 pass, same shape). No-op on a real wide table.
    ref_toks = rebalance_for_compute(
        ref, text_col, split_bytes=LIGHT_KERNEL_SPLIT_BYTES
    ).select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("_tok")
    )
    lm = ref_toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_c"))
    stats = lm.agg(
        F.sum("_c").alias("_total"), F.count(F.lit(1)).alias("_vocab")
    )
    tokd = rebalance_for_compute(
        df, id_col, text_col, split_bytes=LIGHT_KERNEL_SPLIT_BYTES
    ).select(F.col(id_col), F.explode(lower_toks).alias("_tok"))
    denom = F.col("_total") + F.lit(float(alpha)) * (F.col("_vocab") + 1)
    scored = (
        tokd.join(lm, on="_tok", how="left")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_nll",
            -F.log((F.coalesce(F.col("_c"), F.lit(0)) + F.lit(float(alpha))) / denom),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"), F.avg("_nll").alias("avg_nll")
    )
    return (
        df.select(id_col)
        .join(agg, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.col("avg_nll"),
            F.exp("avg_nll").alias("perplexity"),
        )
    )


def bigram_lm_scores(
    df: DataFrame,
    ref_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    lam: float = 0.7,
) -> DataFrame:
    """Interpolated bigram language-model perplexity — one order up
    from :func:`unigram_lm_scores`, the shape of CCNet's actual KenLM
    scorer (word-context models, not bags of words): repetitive
    boilerplate scores LOW under a bigram model where a unigram model
    sees only its word mix, and shuffled-word gibberish scores HIGH
    where the unigram model cannot tell.

    Jelinek-Mercer interpolation with Laplace-smoothed components::

        P(w | v) = lam * (c(v,w) + a) / (ctx(v) + a*(V+1))
                 + (1 - lam) * (c(w) + a) / (total + a*(V+1))

    with ``V`` the reference unigram vocabulary, one shared OOV slot on
    both components, ``ctx(v)`` the count of bigrams starting with
    ``v`` (0 for unseen contexts — the bigram component then degrades
    to the uniform 1/(V+1) floor and the unigram carry dominates). A
    document's FIRST token has no context and is scored by the unigram
    component alone. Output matches ``unigram_lm_scores``:
    ``(id, n_tokens, avg_nll, perplexity)``, NULL scores for empty
    documents.

    Scale shape: the reference reduces to three model tables — unigram
    (vocabulary-sized), bigram (distinct observed pairs — Heaps-law
    sublinear), context totals (vocabulary-sized) — all
    map-side-combinable aggregations, all AQE-broadcastable against the
    corpus-sized token stream. Scoring is one explode of (prev, cur)
    pairs, three broadcast probes, one doc-keyed mean. Nothing
    corpus-sized is ever a join build side.
    """
    if not 0.0 <= float(lam) <= 1.0:
        raise ValueError(f"lam must be in [0, 1] (got {lam})")
    ref = ref_df if ref_df is not None else df

    def _toks(frame: DataFrame) -> Column:
        return tokens(F.lower(F.col(text_col)))

    # parallelism guard: tokenization + pair-zip explode are the per-row
    # cost and otherwise run in the scan stage (one core on a
    # single-file corpus). No-op on a real wide table.
    ref_tok_arr = rebalance_for_compute(
        ref, text_col, split_bytes=LIGHT_KERNEL_SPLIT_BYTES
    ).select(_toks(ref).alias("_ws"))
    uni = (
        ref_tok_arr.select(F.explode("_ws").alias("_tok"))
        .groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("_uc"))
    )
    ref_pairs = ref_tok_arr.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("_ws"), 1, F.greatest(F.size("_ws") - 1, F.lit(0))).alias(
                    "_prev"
                ),
                F.slice(
                    F.col("_ws"), 2, F.greatest(F.size("_ws") - 1, F.lit(0))
                ).alias("_cur"),
            )
        ).alias("_p")
    ).select(F.col("_p._prev").alias("_prev"), F.col("_p._cur").alias("_cur"))
    bi = ref_pairs.groupBy("_prev", "_cur").agg(F.count(F.lit(1)).alias("_bc"))
    ctx = ref_pairs.groupBy(F.col("_prev").alias("_ctx_tok")).agg(
        F.count(F.lit(1)).alias("_ctx")
    )
    stats = uni.agg(F.sum("_uc").alias("_total"), F.count(F.lit(1)).alias("_vocab"))

    # (prev, cur) pairs of the scored corpus, first token with prev NULL
    toks_df = rebalance_for_compute(
        df, id_col, text_col, split_bytes=LIGHT_KERNEL_SPLIT_BYTES
    ).select(F.col(id_col), _toks(df).alias("_ws"))
    pairs = toks_df.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.concat(
                    F.array(F.lit(None).cast("string")),
                    F.slice(
                        F.col("_ws"), 1, F.greatest(F.size("_ws") - 1, F.lit(0))
                    ),
                ).alias("_prev"),
                F.col("_ws").alias("_cur"),
            )
        ).alias("_p"),
    ).select(
        F.col(id_col), F.col("_p._prev").alias("_prev"), F.col("_p._cur").alias("_cur")
    # arrays_zip pads the shorter side with NULL: an empty token array
    # still zips one (null, null) row against the [null] prev seed —
    # real tokens are never NULL, so drop the padding here
    ).where(F.col("_cur").isNotNull())

    a = F.lit(float(alpha))
    denom_u = F.col("_total") + a * (F.col("_vocab") + 1)
    p_uni = (F.coalesce(F.col("_uc"), F.lit(0)) + a) / denom_u
    denom_b = F.coalesce(F.col("_ctx"), F.lit(0)) + a * (F.col("_vocab") + 1)
    p_bi = (F.coalesce(F.col("_bc"), F.lit(0)) + a) / denom_b
    lm = F.lit(float(lam))
    p = F.when(F.col("_prev").isNull(), p_uni).otherwise(
        lm * p_bi + (F.lit(1.0) - lm) * p_uni
    )

    bi_r = bi.select(
        F.col("_prev").alias("_bi_prev"), F.col("_cur").alias("_bi_cur"), "_bc"
    )
    scored = (
        pairs.join(uni, pairs["_cur"] == uni["_tok"], "left")
        .join(
            bi_r,
            (F.col("_prev") == F.col("_bi_prev"))
            & (F.col("_cur") == F.col("_bi_cur")),
            "left",
        )
        .join(ctx, F.col("_prev") == F.col("_ctx_tok"), "left")
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), (-F.log(p)).alias("_nll"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"), F.avg("_nll").alias("avg_nll")
    )
    return (
        df.select(id_col)
        .join(agg, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.col("avg_nll"),
            F.exp("avg_nll").alias("perplexity"),
        )
    )


def calibrate_keep_threshold(
    df: DataFrame,
    score_col: str,
    keep_fraction: float,
    higher_is_better: bool = True,
    exact: bool = False,
    accuracy: int = 10_000,
) -> tuple[DataFrame, DataFrame]:
    """Quality-filter calibration: find the score threshold that keeps
    ~``keep_fraction`` of the corpus, instead of hand-picking a magic
    number that silently keeps 20% on one crawl and 90% on the next.
    The standard way quality classifiers (fastText/CCNet scores,
    perplexity, Gopher signals) are actually deployed: the BUDGET is
    the spec, the threshold is derived.

    Returns ``(calibration, kept)``: a 1-row frame
    ``(threshold, n_total, n_kept)`` and the filtered corpus (ties at
    the threshold are kept, so ``n_kept >= keep_fraction * n_total``).

    ``exact=False`` (default, the 100 TB path) uses
    ``approx_percentile`` — one aggregation with a bounded-memory
    sketch. ``exact=True`` uses the sort-based exact percentile; at
    corpus scale that is a full sort of the score column, so reserve
    it for audits and oracle parity.
    """
    if not 0.0 < float(keep_fraction) <= 1.0:
        raise ValueError(
            f"keep_fraction must be in (0, 1] (got {keep_fraction})"
        )
    q = (1.0 - float(keep_fraction)) if higher_is_better else float(keep_fraction)
    fn = "percentile" if exact else "approx_percentile"
    acc = "" if exact else f", {int(accuracy)}"
    thr = df.agg(
        F.expr(f"{fn}({score_col}, {q}{acc})").cast("double").alias("threshold"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
    )
    side = F.col(score_col) >= F.col("threshold") if higher_is_better else (
        F.col(score_col) <= F.col("threshold")
    )
    kept = df.crossJoin(F.broadcast(thr)).where(side).drop("threshold", "n_total")
    calibration = thr.crossJoin(
        F.broadcast(kept.agg(F.count(F.lit(1)).cast("long").alias("n_kept")))
    ).select("threshold", "n_total", "n_kept")
    return calibration, kept
