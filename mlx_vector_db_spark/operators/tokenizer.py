"""Tokenizer-training statistics at corpus scale.

The reference stops at chunk/embed (integrations/mlx_lm_pipeline.py);
a pretraining pipeline additionally needs the corpus-wide statistics
that tokenizer TRAINING consumes — which at 100 TB are classic
"aggregate the corpus down to its vocabulary first" jobs:

- :func:`word_counts`: the corpus word-frequency table, the input to
  every subword trainer (Sennrich et al. 2016 BPE; SentencePiece).
- :func:`bpe_pair_counts`: adjacent symbol-pair frequencies WITHIN
  words — the statistic one BPE merge round maximizes. Computed from
  the distinct-word frequency table, never the raw corpus: pair count
  = Σ over distinct words (word_freq × occurrences-in-word), so the
  expensive explode runs over the vocabulary (sublinear in corpus
  size, Heaps' law) while the corpus itself is touched by exactly one
  map-side-combinable word count.
- :func:`vocab_coverage`: per-document OOV rate against the corpus
  top-N vocabulary — the coverage check run before freezing a vocab,
  and a quality signal (high-OOV docs are boilerplate/noise/wrong
  language).

Scale design (100 TB): the only corpus-wide shuffle in this module is
the word count (map-side combine makes shuffle volume
distinct-words-per-partition, not tokens). Everything downstream —
pair explode, top-N selection, the vocab side of the coverage join —
operates on the vocabulary, which is broadcast-sized by construction
(``vocab_size`` rows) for the coverage join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mlx_vector_db_spark.functions.text import tokens

__all__ = [
    "word_counts",
    "bpe_pair_counts",
    "bpe_train",
    "bpe_encode",
    "vocab_coverage",
]


def _nonempty_chars(word):  # type: ignore[no-untyped-def]
    """``split(word, '')`` with empty elements filtered out —
    version-proof character array (pre-3.4 Spark appends a trailing
    ``''``, SPARK-40194)."""
    return F.filter(F.split(word, ""), lambda c: c != F.lit(""))


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-frequency table ``(word, n)`` over whitespace tokens.
    One explode + one hash aggregation; the partial aggregate combines
    map-side so the shuffle carries distinct-words-per-partition."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Adjacent character-pair frequencies within words, corpus-weighted
    — the argmax of one byte-pair-encoding merge round (Sennrich et al.
    2016, alg. 1) expressed relationally: count distinct words first,
    then explode each VOCABULARY entry into its ``len(w)-1`` adjacent
    pairs weighted by the word's corpus frequency.

    Returns ``(lhs, rhs, n_pairs)`` with ``n_pairs >= min_count``,
    where ``n_pairs`` counts every occurrence position (a pair appearing
    twice in one word counts twice per word occurrence — BPE's counting
    rule). Single-character words contribute nothing. (``lhs``/``rhs``
    rather than left/right — those are reserved words in ANSI SQL and
    the column names are part of the oracle contract.)

    This is the first merge round only (character symbols); iterated
    merges re-segment against grown symbols, which is a driver-side loop
    over this same vocabulary-weighted aggregation — the corpus is never
    re-scanned after the initial word count, which is what makes BPE
    training feasible at 100 TB.
    """
    wc = word_counts(df, text_col)
    # chars referenced by both zip_with sides — materialize the split
    # once in its own projection (array exprs evaluate outside codegen
    # CSE, the same trap winnow_fingerprints documents). The empty-
    # string filter is defensive versioning: split(word, '') emits a
    # trailing '' element before Spark 3.4 (SPARK-40194), which would
    # add a bogus (last_char, '') pair per word; on >= 3.4 (also pinned
    # in pyproject.toml) the filter matches nothing.
    chars_df = wc.where(F.length("word") >= 2).select(
        "n", _nonempty_chars(F.col("word")).alias("_ch")
    )
    ch = F.col("_ch")
    width = F.size(ch) - 1
    pairs = F.zip_with(
        F.slice(ch, 1, F.greatest(width, F.lit(0))),
        F.slice(ch, 2, F.greatest(width, F.lit(0))),
        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
    )
    return (
        chars_df.select(F.col("n"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("n").cast("long").alias("n_pairs"))
        .where(F.col("n_pairs") >= F.lit(int(min_count)))
    )


def bpe_train(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    max_vocab_rows: int = 5_000_000,
    strategy: str = "auto",
    merge_batch: int = 8,
    stats: dict | None = None,
) -> DataFrame:
    """Byte-pair-encoding merge training (Sennrich et al. 2016, alg. 1)
    over a corpus: returns the learned merge table ``(rank, lhs, rhs,
    n_pairs)`` with ``rank`` starting at 1, each row the argmax
    adjacent-pair at that round under a DETERMINISTIC tie-break (count
    desc, then (lhs, rhs) asc) so the table is reproducible across
    engines and cluster sizes. Training stops early when the best pair
    falls below ``min_pair_count`` (merging hapax pairs memorizes
    noise).

    Scale contract (100 TB): the corpus is scanned exactly ONCE — the
    distributed, map-side-combined :func:`word_counts` — and every
    merge round then runs over the word-frequency table, which is
    Heaps-law-sublinear in corpus size (the standard industrial shape:
    subword trainers all reduce to the word-frequency table first).
    Two interchangeable round engines, selected by ``strategy``:

    - ``"driver"``: collect the word-frequency table once (an Arrow
      ``toPandas`` transfer of plain ``(word, n)`` columns, bounded by
      ``max_vocab_rows``) and loop in local memory — fastest when the
      vocabulary fits, zero Spark jobs per round.
    - ``"distributed"`` (the r7 path): the vocabulary NEVER leaves the
      executors. Each round recomputes pair counts relationally over
      the evolving symbol-array column (the :func:`bpe_pair_counts`
      explode/aggregate shape), collects exactly ONE row (the argmax),
      and re-segments the symbol arrays with a JVM-side
      ``aggregate()`` fold that replays the merge left-to-right
      non-overlapping — identical semantics to the driver loop (the
      fold can never re-consume a just-merged token: that would need
      ``lhs + rhs == lhs``, impossible for non-empty ``rhs``). Words
      reduced to one symbol can never pair again and are dropped from
      the working set. Driver traffic per round: one row.
    - ``"auto"``: count the vocabulary (one cheap aggregate) and pick
      ``"driver"`` iff it fits ``max_vocab_rows`` — past the bound the
      r6 behavior (truncate + warn, counts become lower bounds) is
      replaced by exact distributed training.

    ``merge_batch`` (distributed path only) batches up to that many
    CERTIFIED-compatible merges per Spark round — sequential-identical
    by proof, not heuristic; see :func:`_bpe_train_distributed` — so a
    32k-merge vocabulary doesn't pay 32k scheduler round-trips.
    ``merge_batch=1`` recovers the strict one-merge-per-round loop.
    ``stats``, when a dict is passed, receives ``{"rounds": <Spark
    argmax rounds run>, "merges": <merges learned>}`` for
    observability (the batching win is rounds << merges).
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1 (got {num_merges})")
    if max_vocab_rows < 1:
        raise ValueError(f"max_vocab_rows must be >= 1 (got {max_vocab_rows})")
    if merge_batch < 1:
        raise ValueError(f"merge_batch must be >= 1 (got {merge_batch})")
    if strategy not in ("auto", "driver", "distributed"):
        raise ValueError(
            f"strategy must be 'auto', 'driver', or 'distributed' "
            f"(got {strategy!r})"
        )
    spark = df.sparkSession
    wc_df = word_counts(df, text_col)
    if strategy == "auto":
        # the routing probe would otherwise re-scan the corpus on top
        # of training's own read — checkpoint the word count so the
        # probe materializes it once and training reads the blocks
        # (the "corpus scanned exactly ONCE" contract holds for auto)
        wc_df = wc_df.localCheckpoint(eager=False)
        # limit(max+1) bounds the counting job itself: we only need to
        # know WHETHER the vocabulary exceeds the cap, never by how much
        over = wc_df.limit(int(max_vocab_rows) + 1).count() > max_vocab_rows
        strategy = "distributed" if over else "driver"
    if strategy == "distributed":
        return _bpe_train_distributed(
            spark,
            wc_df,
            int(num_merges),
            int(min_pair_count),
            merge_batch=int(merge_batch),
            stats=stats,
        )
    if stats is not None:
        stats["rounds"] = 0  # driver loop: zero Spark rounds past the scan
    pdf = (
        wc_df.orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(int(max_vocab_rows) + 1)
        .select("word", "n")
        .toPandas()  # Arrow columns of (word, n) — no Row-object overhead
    )
    if len(pdf) > max_vocab_rows:
        import warnings

        warnings.warn(
            f"bpe_train: vocabulary exceeds max_vocab_rows="
            f"{max_vocab_rows}; training on the {max_vocab_rows} most "
            f"frequent words (pair counts become lower bounds) — use "
            f"strategy='distributed' (or 'auto') for exact training "
            f"past the driver bound",
            stacklevel=2,
        )
        pdf = pdf.iloc[: int(max_vocab_rows)]
    vocab: dict[tuple[str, ...], int] = {}
    for word, n in zip(pdf["word"], pdf["n"]):
        key = tuple(word)
        vocab[key] = vocab.get(key, 0) + int(n)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, int(num_merges) + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + n
        if not counts:
            break
        (lhs, rhs), best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best < min_pair_count:
            break
        merged = lhs + rhs
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
        merges.append((rank, lhs, rhs, best))
    if stats is not None:
        stats["merges"] = len(merges)
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, n_pairs long"
    )


def _merge_fold(lhs: str, rhs: str):  # type: ignore[no-untyped-def]
    """Column expression: re-segment a symbol array by one BPE merge,
    left-to-right non-overlapping, as a JVM-side ``aggregate`` fold.

    Walking symbols left to right: append each symbol unless the
    accumulator's last element is ``lhs`` and the current symbol is
    ``rhs`` — then replace the last element with ``lhs + rhs``. This is
    exactly the training loop's scan: a merged token can never be
    re-consumed as ``lhs`` within the same round because that would
    require ``lhs + rhs == lhs`` (impossible for non-empty ``rhs``), so
    overlapping occurrences resolve leftmost-first (e.g. merging
    ``(a, a)`` on ``a a a`` yields ``aa a``, not ``a aa``).
    """
    merged = lhs + rhs

    def step(acc, s):  # type: ignore[no-untyped-def]
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lhs))
            & (s == F.lit(rhs))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    def fold(col):  # type: ignore[no-untyped-def]
        return F.aggregate(col, F.array().cast("array<string>"), step)

    return fold


def _adjacent_pairs(s):  # type: ignore[no-untyped-def]
    """struct(lhs, rhs) array of adjacent symbol pairs in array ``s``."""
    width = F.size(s) - 1
    return F.zip_with(
        F.slice(s, 1, F.greatest(width, F.lit(0))),
        F.slice(s, 2, F.greatest(width, F.lit(0))),
        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
    )


def _certify_batch(
    vocab: DataFrame, cands: list[tuple[str, str, int]]
) -> list[tuple[str, str, int]]:
    """The longest PREFIX of ``cands`` (pair-count-ordered argmax
    candidates, symbol-disjoint by construction) that is provably
    sequential-identical when applied as one batch.

    Proof obligations per accepted prefix ``p_1..p_j``:

    1. *Invariance* (checked by the caller's disjointness filter): with
       ``{lhs_i, rhs_i, lhs_i+rhs_i}`` pairwise disjoint across the
       prefix, applying ``p_1..p_{i-1}`` never creates or destroys an
       occurrence of ``(lhs_i, rhs_i)`` — destroyed adjacencies all
       involve a merged symbol, created ones all involve the new token,
       and the string-equality clause rules out a new token aliasing a
       later pair's symbol. Existing pairs' counts only DECREASE.
    2. *No new-pair overtake* (this function, ONE Spark action): a
       merge ``p_i`` creates only pairs containing its new token, and
       every such pair's count — even after later batch merges fuse
       onto it — is bounded by a triple count ``#(x, lhs_i, rhs_i)`` or
       ``#(lhs_i, rhs_i, y)`` over the CURRENT vocab, where the triple
       count SUMS the word frequency ``n`` over every occurrence of the
       distinct triple (across word types and repeats within a word).
       The job computes ``max_new_i`` = the largest such summed triple
       count per candidate; ``p_j`` stays the sequential round-``j``
       argmax iff ``n_pairs_j > max(max_new_i for i < j)`` (strict:
       equal-count ties against an unknown new pair cannot be ordered
       safely).
    3. *No merged-string aliasing*: if ``lhs_i + rhs_i`` equals a
       symbol ALREADY in the current vocab (reachable only via
       context-dependent segmentation of the same character run), a
       post-merge pair ``(x, merged_i)`` counts old + new occurrences
       and the triple bound no longer covers it — so the batch is cut
       at the first aliasing candidate (``cands[0]`` itself is always
       the sound round argmax, aliased or not; nothing is batched
       AFTER an aliasing merge). Checked in the same action via a
       1-row × 1-row crossJoin with a distinct-symbol membership
       aggregate.

    Candidates failing any check CUT the batch (skipping would diverge
    from the sequential argmax order). Worst case the prefix is just
    ``cands[:1]`` — the strict top-1 round, always sound.
    """
    if len(cands) <= 1:
        return cands
    pair_keys = [(lhs, rhs) for lhs, rhs, _ in cands]
    s = F.col("syms")
    width = F.size(s) - 2
    triples = F.zip_with(
        F.slice(s, 1, F.greatest(width, F.lit(0))),
        F.slice(s, 2, F.greatest(width, F.lit(0))),
        lambda a, b: F.struct(a.alias("x1"), b.alias("x2")),
    )
    t3 = F.slice(s, 3, F.greatest(width, F.lit(0)))
    triples = F.zip_with(
        triples,
        t3,
        lambda ab, c: F.struct(
            ab["x1"].alias("x1"), ab["x2"].alias("x2"), c.alias("x3")
        ),
    )
    t = (
        vocab.where(F.size("syms") >= 3)
        .select(F.col("n"), F.explode(triples).alias("t"))
        .select("n", F.col("t.x1").alias("x1"), F.col("t.x2").alias("x2"), F.col("t.x3").alias("x3"))
    )
    # a distinct triple's count SUMS n over every occurrence (across
    # word types and repeats within a word) — a per-occurrence max would
    # under-bound a triple spread over several words and admit an
    # unsound batch
    tc = (
        t.groupBy("x1", "x2", "x3")
        .agg(F.sum("n").cast("long").alias("tn"))
    )
    key12 = F.concat_ws(" ", F.col("x1"), F.col("x2"))
    key23 = F.concat_ws(" ", F.col("x2"), F.col("x3"))
    # new pair (merged_i, y) arises from triple (lhs_i, rhs_i, y) —
    # keyed on positions 1-2; (x, merged_i) from (x, lhs_i, rhs_i) —
    # keyed on positions 2-3. Max of the summed triple counts per
    # candidate in one conditional-max pass.
    aggs = []
    for i, p in enumerate(pair_keys):
        lit = F.lit(" ".join(p))
        aggs.append(
            F.max(
                F.when((key12 == lit) | (key23 == lit), F.col("tn"))
            ).alias(f"_m{i}")
        )
    # merged-string aliasing probe: does lhs_i+rhs_i already exist as a
    # vocab symbol? (1-row aggregate, crossJoined 1x1 with the triple
    # row so the whole certification stays a single collect)
    sym = vocab.select(F.explode(s).alias("sym"))
    alias_aggs = [
        F.max(
            F.when(F.col("sym") == F.lit(lhs + rhs), F.lit(1))
        ).alias(f"_a{i}")
        for i, (lhs, rhs, _n) in enumerate(cands)
    ]
    row = tc.agg(*aggs).crossJoin(sym.agg(*alias_aggs)).collect()[0]
    max_new = [int(row[f"_m{i}"]) if row[f"_m{i}"] is not None else 0 for i in range(len(cands))]
    aliased = [row[f"_a{i}"] is not None for i in range(len(cands))]
    accepted = [cands[0]]
    running = max_new[0]
    for j in range(1, len(cands)):
        # never batch past an aliasing merge: its new token fuses with
        # pre-existing occurrences of the same string, voiding the
        # triple bound for pairs that involve it
        if aliased[j - 1]:
            break
        if cands[j][2] > running:
            accepted.append(cands[j])
            running = max(running, max_new[j])
        else:
            break
    return accepted


def _bpe_train_distributed(
    spark,
    wc_df: DataFrame,
    num_merges: int,
    min_pair_count: int,
    merge_batch: int = 8,
    stats: dict | None = None,
) -> DataFrame:
    """The executor-resident BPE merge loop behind
    :func:`bpe_train(strategy="distributed")`. The working set is the
    word-frequency table as ``(syms array<string>, n)``; each round is
    one Spark job (pair explode -> aggregate -> top-``merge_batch``
    collect, ``merge_batch`` rows to the driver) plus — when more than
    one candidate survives the disjointness filter — one certification
    job (:func:`_certify_batch`), then ONE lazy re-segmentation that
    chains the accepted folds in rank order (disjointness makes them
    commute, but rank order keeps the replay auditable). Lineage is
    truncated every round with ``localCheckpoint`` so the per-round
    ``aggregate()`` folds never nest in the optimizer.

    Exact, not heuristic: the emitted merge table is IDENTICAL to the
    one-merge-per-round loop for any corpus (pytest parity on the
    Sennrich fixture and on random corpora) — batching only removes
    scheduler round-trips, which is what makes a 32k-merge vocabulary
    trainable without 32k Spark jobs.
    """
    vocab = (
        wc_df.select(_nonempty_chars(F.col("word")).alias("syms"), "n")
        # 1-symbol words can never form a pair in any round; dropping
        # them up front shrinks every subsequent scan
        .where(F.size("syms") >= 2)
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < num_merges:
        want = num_merges - len(merges)
        top = (
            vocab.select(F.col("n"), F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("n").cast("long").alias("n_pairs"))
            # TakeOrderedAndProject: partial top-k per partition,
            # merge_batch rows to the driver — the round's driver traffic
            .orderBy(
                F.col("n_pairs").desc(), F.col("lhs").asc(), F.col("rhs").asc()
            )
            .limit(min(int(merge_batch), want))
            .collect()
        )
        rounds += 1
        top = [
            (r["lhs"], r["rhs"], int(r["n_pairs"]))
            for r in top
            if int(r["n_pairs"]) >= min_pair_count
        ]
        if not top:
            break
        # longest prefix with pairwise-disjoint {lhs, rhs, lhs+rhs}
        # symbol sets (invariance precondition; see _certify_batch)
        cands = [top[0]]
        used = set(top[0][:2]) | {top[0][0] + top[0][1]}
        for lhs, rhs, n in top[1:]:
            trio = {lhs, rhs, lhs + rhs}
            if trio & used:
                break
            cands.append((lhs, rhs, n))
            used |= trio
        batch = _certify_batch(vocab, cands)
        if len(cands) > 1:
            rounds += 1  # the certification job ran (even if it cut to 1)
        out = F.col("syms")
        for lhs, rhs, _n in batch:
            out = _merge_fold(lhs, rhs)(out)
        vocab = (
            vocab.select(out.alias("syms"), "n")
            .where(F.size("syms") >= 2)
            .localCheckpoint(eager=False)
        )
        base = len(merges)
        merges.extend(
            (base + i + 1, lhs, rhs, n) for i, (lhs, rhs, n) in enumerate(batch)
        )
    if stats is not None:
        stats["rounds"] = rounds
        stats["merges"] = len(merges)
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, n_pairs long"
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    output_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a trained BPE merge table to a corpus: per word, replay
    ``merges`` IN RANK ORDER (each merge rewrites all its left-to-right
    non-overlapping occurrences — the training loop's exact update, so
    ``bpe_encode(df, merges_from_bpe_train)`` reproduces training
    segmentation). Returns ``(id_col, output_col array<string>)``;
    empty/whitespace documents get an empty array.

    The merge replay is inherently iterative per word — no Catalyst
    expression exists for it — so this is the documented
    Python-unavoidable path: an Arrow-batched pandas UDF (never
    row-at-a-time), with the merge table shipped once per executor in
    the closure. Map-only: zero shuffle, scales embarrassingly.

    For production-size merge tables prefer encoding each DISTINCT word
    once: join ``df`` through :func:`word_counts`-style word rows, or
    rely on the per-batch memo below, which caches encodings within
    each Arrow batch (Zipf's law makes the hit rate high).
    """
    from pyspark.sql.functions import pandas_udf

    merge_list = [(str(a), str(b)) for a, b in merges]

    @pandas_udf("array<string>")
    def _encode(texts):  # type: ignore[no-untyped-def]
        import pandas as pd

        memo: dict[str, tuple[str, ...]] = {}

        def encode_word(word: str) -> tuple[str, ...]:
            hit = memo.get(word)
            if hit is not None:
                return hit
            syms: list[str] = list(word)
            for lhs, rhs in merge_list:
                if len(syms) < 2:
                    break
                out: list[str] = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                        out.append(lhs + rhs)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            memo[word] = tuple(syms)
            return memo[word]

        def encode_doc(text) -> list[str]:
            if text is None:
                return []
            toks: list[str] = []
            for w in text.split():
                toks.extend(encode_word(w))
            return toks

        return pd.Series([encode_doc(t) for t in texts])

    return df.select(F.col(id_col), _encode(F.col(text_col)).alias(output_col))


def vocab_coverage(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-N
    vocabulary: ``(id_col, n_tokens, n_oov, oov_rate)``.

    The vocabulary is the ``vocab_size`` most frequent words with a
    DETERMINISTIC tie-break (count desc, then word asc) so the result
    is engine-portable. Empty documents report ``n_tokens = 0`` and a
    NULL ``oov_rate``.

    Scale: two passes over the corpus — the word count (one shuffle,
    map-side combined) and the coverage join, where the vocab side is
    ``vocab_size`` rows and broadcasts; per-doc token rows join against
    it map-side, then re-aggregate on the document key. Top-N selection
    is ``orderBy().limit()``, which Catalyst compiles to
    ``TakeOrderedAndProject`` — partial top-k per partition, so even a
    100M-distinct-word table never passes through a single-partition
    sort (a global row_number window would).
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1 (got {vocab_size})")
    wc = word_counts(df, text_col)
    vocab = (
        wc.orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(int(vocab_size))
        .select("word")
    )
    toks = df.select(
        F.col(id_col), F.explode_outer(tokens(text_col)).alias("word")
    )
    return (
        toks.join(
            F.broadcast(vocab.withColumn("_in_vocab", F.lit(1))),
            on="word",
            how="left",
        )
        .groupBy(id_col)
        .agg(
            F.count("word").cast("long").alias("n_tokens"),
            (F.count("word") - F.count("_in_vocab")).cast("long").alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            F.when(
                F.col("n_tokens") > 0,
                F.round(F.col("n_oov") / F.col("n_tokens"), 6),
            ),
        )
    )
