"""Unit tests for tokenizer-training statistics (BPE pair counts,
vocabulary coverage) on hand-computed fixtures; sf0.01 oracle
equivalence is covered by test_entry.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.tokenizer import (
    bpe_encode,
    bpe_pair_counts,
    bpe_train,
    vocab_coverage,
    word_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_counts(spark):
    df = _docs(spark, [(1, "a b a"), (2, " b  c "), (3, "")])
    got = {r.word: r.n for r in word_counts(df).collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_bpe_pair_counts_hand_computed(spark):
    # Sennrich et al. toy corpus shape: low x2, lower x1.
    df = _docs(spark, [(1, "low low"), (2, "lower")])
    got = {(r.lhs, r.rhs): r.n_pairs for r in bpe_pair_counts(df).collect()}
    assert got == {
        ("l", "o"): 3,
        ("o", "w"): 3,
        ("w", "e"): 1,
        ("e", "r"): 1,
    }


def test_bpe_pair_counts_repeat_within_word_and_min_count(spark):
    # "aaa" has the pair (a,a) at two positions -> counts twice per
    # occurrence; single-char words contribute nothing.
    df = _docs(spark, [(1, "aaa aaa b ab")])
    got = {(r.lhs, r.rhs): r.n_pairs for r in bpe_pair_counts(df).collect()}
    assert got == {("a", "a"): 4, ("a", "b"): 1}
    capped = {
        (r.lhs, r.rhs): r.n_pairs
        for r in bpe_pair_counts(df, min_count=2).collect()
    }
    assert capped == {("a", "a"): 4}


def test_vocab_coverage_tie_break_and_empty(spark):
    # counts: low=2; {a, z} tie at 1 -> vocab_size=2 takes (low, a) by
    # the count-desc/word-asc deterministic tie-break.
    df = _docs(spark, [(1, "low low a"), (2, "z"), (3, "")])
    rows = {r.doc_id: r for r in vocab_coverage(df, vocab_size=2).collect()}
    assert rows[1].n_tokens == 3 and rows[1].n_oov == 0
    assert rows[2].n_tokens == 1 and rows[2].n_oov == 1 and rows[2].oov_rate == 1.0
    assert rows[3].n_tokens == 0 and rows[3].n_oov == 0 and rows[3].oov_rate is None


def test_bpe_train_sennrich_example(spark):
    # Sennrich et al. frequencies (low:5, lower:2, newest:6, widest:3),
    # no end-of-word marker; merges hand-computed under the
    # count-desc/(lhs,rhs)-asc tie-break.
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = _docs(spark, [(1, text)])
    got = [
        (r.rank, r.lhs, r.rhs, r.n_pairs)
        for r in bpe_train(df, num_merges=5).orderBy("rank").collect()
    ]
    assert got == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
        (5, "e", "w", 6),
    ]


def test_bpe_train_min_pair_count_stops_early(spark):
    df = _docs(spark, [(1, "ab ab cd")])
    got = [(r.lhs, r.rhs, r.n_pairs) for r in bpe_train(df, num_merges=3).collect()]
    assert got == [("a", "b", 2)]  # cd's pair count 1 < min_pair_count


def test_bpe_train_first_merge_matches_pair_counts_argmax(spark):
    df = _docs(spark, [(1, "low low lower"), (2, "newest widest widest")])
    top = (
        bpe_pair_counts(df)
        .orderBy([F.col("n_pairs").desc(), F.col("lhs").asc(), F.col("rhs").asc()])
        .first()
    )
    first = bpe_train(df, num_merges=1).first()
    assert (first.lhs, first.rhs, first.n_pairs) == (top.lhs, top.rhs, top.n_pairs)


def test_bpe_encode_replays_training_segmentation(spark):
    # Merges learned on the Sennrich corpus, replayed in rank order:
    # es, est, lo, low, ew (hand-derived segmentations below).
    train_text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    train = _docs(spark, [(1, train_text)])
    merges = [
        (r.lhs, r.rhs)
        for r in bpe_train(train, num_merges=5).orderBy("rank").collect()
    ]
    df = _docs(spark, [(1, "newest lower widest"), (2, None), (3, "")])
    rows = {r.doc_id: r.bpe_tokens for r in bpe_encode(df, merges).collect()}
    assert rows[1] == ["n", "ew", "est", "low", "e", "r", "w", "i", "d", "est"]
    assert rows[2] == [] and rows[3] == []


def test_bpe_encode_overlap_is_left_to_right(spark):
    df = _docs(spark, [(1, "aaa")])
    rows = bpe_encode(df, [("a", "a")]).collect()
    assert rows[0].bpe_tokens == ["aa", "a"]


def test_bpe_train_truncation_warns(spark):
    # truncation is now a strategy='driver'-only behavior: the default
    # 'auto' routes past-the-bound vocabularies to the exact
    # distributed path instead
    df = _docs(spark, [(1, "a bb ccc dddd")])
    with pytest.warns(UserWarning, match="max_vocab_rows"):
        out = bpe_train(
            df, num_merges=1, min_pair_count=1, max_vocab_rows=2,
            strategy="driver",
        )
    assert out.count() == 1


def test_bpe_train_distributed_parity_sennrich(spark):
    """The executor-resident merge loop reproduces the driver loop's
    merge table exactly on the Sennrich fixture (same argmax, same
    tie-break, same left-to-right re-segmentation)."""
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = _docs(spark, [(1, text)])
    expect = [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
        (5, "e", "w", 6),
    ]
    got = [
        (r.rank, r.lhs, r.rhs, r.n_pairs)
        for r in bpe_train(df, num_merges=5, strategy="distributed")
        .orderBy("rank")
        .collect()
    ]
    assert got == expect


def test_bpe_train_distributed_overlap_and_early_stop(spark):
    """Overlapping occurrences merge leftmost-first in the fold
    (merging (a,a) on 'aaaa' counts 3 then re-segments to 'aa aa'),
    and training stops when the working set runs dry."""
    df = _docs(spark, [(1, "aaaa aaaa")])
    got = [
        (r.rank, r.lhs, r.rhs, r.n_pairs)
        for r in bpe_train(
            df, num_merges=10, min_pair_count=1, strategy="distributed"
        )
        .orderBy("rank")
        .collect()
    ]
    driver = [
        (r.rank, r.lhs, r.rhs, r.n_pairs)
        for r in bpe_train(
            df, num_merges=10, min_pair_count=1, strategy="driver"
        )
        .orderBy("rank")
        .collect()
    ]
    assert got == driver
    # rounds: (a,a)x3 -> aa aa; (aa,aa)x1 -> aaaa; then no pairs left
    assert got == [(1, "a", "a", 6), (2, "aa", "aa", 2)]


def test_bpe_train_auto_routes_past_bound_exactly(spark):
    """strategy='auto' with a vocabulary past max_vocab_rows trains
    distributed — EXACT merge table (no truncation, no warning),
    matching the untruncated driver run."""
    import warnings

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = _docs(spark, [(1, text)])
    full = [
        (r.rank, r.lhs, r.rhs, r.n_pairs)
        for r in bpe_train(df, num_merges=4, strategy="driver")
        .orderBy("rank")
        .collect()
    ]
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any truncation warning fails
        auto = [
            (r.rank, r.lhs, r.rhs, r.n_pairs)
            for r in bpe_train(df, num_merges=4, max_vocab_rows=2)
            .orderBy("rank")
            .collect()
        ]
    assert auto == full


def test_bpe_train_rejects_bad_params(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        bpe_train(df, num_merges=0)
    with pytest.raises(ValueError):
        bpe_train(df, num_merges=1, max_vocab_rows=0)
    with pytest.raises(ValueError):
        bpe_train(df, num_merges=1, strategy="bogus")


def test_vocab_coverage_rejects_bad_size(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        vocab_coverage(df, vocab_size=0)


def test_bpe_train_batched_parity_random_corpus(spark):
    """merge_batch > 1 is EXACT: the batched distributed loop, the
    strict one-merge-per-round loop, and the driver loop all emit the
    identical merge table on a random corpus (the certification rule
    cuts every batch that could diverge)."""
    import random

    rng = random.Random(17)
    words = [
        "".join(rng.choice("abcdef") for _ in range(rng.randint(2, 7)))
        for _ in range(120)
    ]
    text = " ".join(rng.choice(words) for _ in range(800))
    df = _docs(spark, [(1, text[:2000]), (2, text[2000:])])

    def table(**kw):
        return [
            (r.rank, r.lhs, r.rhs, r.n_pairs)
            for r in bpe_train(df, num_merges=25, min_pair_count=1, **kw)
            .orderBy("rank")
            .collect()
        ]

    batched = table(strategy="distributed", merge_batch=8)
    strict = table(strategy="distributed", merge_batch=1)
    driver = table(strategy="driver")
    assert batched == strict == driver
    assert len(batched) == 25


def test_bpe_train_batch_certification_cuts_self_pair_overtake(spark):
    """The one case symbol-disjointness alone cannot catch: merging a
    self-pair (a,a) creates (aa,a) pairs that can overtake the next
    disjoint candidate. 'aaa'x9 gives (a,a)=18, then (aa,a)=9 which
    MUST outrank (c,d)=5 in sequential order — the certification job
    cuts the batch so the batched table stays sequential-identical."""
    df = _docs(spark, [(1, " ".join(["aaa"] * 9 + ["cd"] * 5))])
    expect = [(1, "a", "a", 18), (2, "aa", "a", 9), (3, "c", "d", 5)]
    for kw in (
        dict(strategy="distributed", merge_batch=8),
        dict(strategy="distributed", merge_batch=1),
        dict(strategy="driver"),
    ):
        got = [
            (r.rank, r.lhs, r.rhs, r.n_pairs)
            for r in bpe_train(df, num_merges=3, min_pair_count=1, **kw)
            .orderBy("rank")
            .collect()
        ]
        assert got == expect, (kw, got)


def test_bpe_train_batching_cuts_rounds_4x(spark):
    """On a corpus of disjoint frequent pairs, a 100-merge training run
    completes in >= 4x fewer Spark rounds than one-merge-per-round,
    with the identical merge table."""
    # 100 two-symbol words over a 200-char alphabet: every candidate
    # batch is fully disjoint and certification finds no triples
    alpha = [chr(0x100 + i) for i in range(200)]
    parts = []
    for i in range(100):
        parts.extend([alpha[2 * i] + alpha[2 * i + 1]] * (300 - 2 * i))
    df = _docs(spark, [(1, " ".join(parts))])
    s_batched: dict = {}
    s_strict: dict = {}
    batched = [
        (r.rank, r.lhs, r.rhs, r.n_pairs)
        for r in bpe_train(
            df,
            num_merges=100,
            min_pair_count=1,
            strategy="distributed",
            merge_batch=16,
            stats=s_batched,
        )
        .orderBy("rank")
        .collect()
    ]
    strict = [
        (r.rank, r.lhs, r.rhs, r.n_pairs)
        for r in bpe_train(
            df,
            num_merges=100,
            min_pair_count=1,
            strategy="distributed",
            merge_batch=1,
            stats=s_strict,
        )
        .orderBy("rank")
        .collect()
    ]
    assert batched == strict and len(batched) == 100
    assert s_strict["rounds"] >= 100
    assert s_batched["rounds"] * 4 <= s_strict["rounds"], (s_batched, s_strict)


def test_bpe_train_rejects_bad_merge_batch(spark):
    df = _docs(spark, [(1, "ab ab")])
    with pytest.raises(ValueError, match="merge_batch"):
        bpe_train(df, num_merges=1, merge_batch=0)


def test_bpe_train_batch_certification_sums_spread_triples(spark):
    """A triple spread across several word types must SUM its counts,
    not take the per-word max, or certification admits an unsound
    batch. Corpus: 'axy'x4 + 'qaxy'x4 + 'ax'x2 + 'cd'x8. Round 1
    argmax is (a,x)=10; merging it creates (ax,y)=8 (4 from 'axy' + 4
    from 'qaxy'), which TIES (c,d)=8 and wins the lhs tie-break — so
    (c,d) must NOT be batched with (a,x). A max-per-row bound sees
    only 4 and would accept it."""
    df = _docs(
        spark,
        [(1, " ".join(["axy"] * 4 + ["qaxy"] * 4 + ["ax"] * 2 + ["cd"] * 8))],
    )
    expect = [
        (r.rank, r.lhs, r.rhs, r.n_pairs)
        for r in bpe_train(
            df, num_merges=3, min_pair_count=1, strategy="driver"
        )
        .orderBy("rank")
        .collect()
    ]
    assert expect == [(1, "a", "x", 10), (2, "ax", "y", 8), (3, "c", "d", 8)]
    for mb in (8, 1):
        got = [
            (r.rank, r.lhs, r.rhs, r.n_pairs)
            for r in bpe_train(
                df,
                num_merges=3,
                min_pair_count=1,
                strategy="distributed",
                merge_batch=mb,
            )
            .orderBy("rank")
            .collect()
        ]
        assert got == expect, (mb, got)


def test_certify_batch_cuts_after_merged_string_alias(spark):
    """If a candidate's lhs+rhs equals a symbol ALREADY in the vocab,
    nothing may be batched after it: post-merge pairs on the fused
    symbol count old + new occurrences, voiding the triple bound.
    (No corpus reaching this state via argmax order is known — the
    leftmost-fold makes the simple constructions unreachable — so the
    state is synthesized directly.)"""
    from mlx_vector_db_spark.operators.tokenizer import _certify_batch

    rows = [
        (["x", "y"], 10),
        (["a", "b"], 9),  # candidate 2's symbols exist somewhere
        (["q", "abc"], 5),  # 'abc' is already a vocab symbol
        (["e", "f"], 7),
    ]
    vocab = spark.createDataFrame(rows, "syms array<string>, n long")
    cands = [("x", "y", 10), ("ab", "c", 8), ("e", "f", 7)]
    got = _certify_batch(vocab, cands)
    # ('ab','c') itself is still a sound round argmax (last element),
    # but ('e','f') after the aliasing merge is not
    assert got == [("x", "y", 10), ("ab", "c", 8)]
    # without the aliasing symbol the same shape batches all three
    clean = spark.createDataFrame(
        [r for r in rows if r[0] != ["q", "abc"]], "syms array<string>, n long"
    )
    assert _certify_batch(clean, cands) == cands


def test_bpe_train_batched_parity_run_heavy_corpus(spark):
    """Adversarial parity attempt at the aliasing construction: long
    single-character runs make (a,a)-style self-pairs and multi-way
    concatenation ambiguity ('aaa' = a+aa = aa+a) the dominant merge
    material; the batched table must still be sequential-identical."""
    import random

    rng = random.Random(23)
    words = []
    for _ in range(150):
        w = "".join(
            rng.choice("ab") * rng.randint(1, 5) for _ in range(rng.randint(1, 3))
        )
        words.append(w)
    text = " ".join(rng.choice(words) for _ in range(600))
    df = _docs(spark, [(1, text)])

    def table(**kw):
        return [
            (r.rank, r.lhs, r.rhs, r.n_pairs)
            for r in bpe_train(df, num_merges=20, min_pair_count=1, **kw)
            .orderBy("rank")
            .collect()
        ]

    batched = table(strategy="distributed", merge_batch=8)
    driver = table(strategy="driver")
    assert batched == driver
