"""Unit tests for tokenizer-training statistics (BPE pair counts,
vocabulary coverage) on hand-computed fixtures; sf0.01 oracle
equivalence is covered by test_entry.py."""

from __future__ import annotations

import pytest

from mlx_vector_db_spark.operators.tokenizer import (
    bpe_pair_counts,
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


def test_vocab_coverage_rejects_bad_size(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        vocab_coverage(df, vocab_size=0)
