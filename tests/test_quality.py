"""Unit tests for the corpus-quality operators (repetition signals,
n-gram contamination) on tiny hand-computed fixtures; the sf0.01
oracle equivalence is covered by test_entry.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.quality import (
    hashed_feature_buckets,
    hashed_linear_score,
    ngram_contamination,
    repetition_signals,
    winnow_crossdoc_pairs,
    winnow_fingerprints,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngrams_basic(spark):
    df = _docs(spark, [(0, "a b c d")])
    out = df.select(
        word_ngrams("text", 1).alias("g1"),
        word_ngrams("text", 2).alias("g2"),
        word_ngrams("text", 4).alias("g4"),
        word_ngrams("text", 5).alias("g5"),
    ).first()
    assert out.g1 == ["a", "b", "c", "d"]
    assert out.g2 == ["a b", "b c", "c d"]
    assert out.g4 == ["a b c d"]
    assert out.g5 == []  # shorter than n


def test_word_ngrams_rejects_bad_n(spark):
    with pytest.raises(ValueError):
        word_ngrams("text", 0)


def test_repetition_signals_hand_computed(spark):
    # "a a a b": words a*3 b*1 -> 3/4; bigrams "a a"*2 "a b"*1 -> 2/3;
    # trigrams "a a a" "a a b" all unique -> 0.
    # "x y z x y z x y z": every trigram occurs >1 time -> dup frac 1.0.
    df = _docs(spark, [(1, "a a a b"), (2, "x y z x y z x y z")])
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert rows[1].top_word_frac == 0.75
    assert rows[1].top_bigram_frac == round(2 / 3, 6)
    assert rows[1].dup_trigram_frac == 0.0
    assert rows[2].top_word_frac == round(3 / 9, 6)
    assert rows[2].dup_trigram_frac == 1.0


def test_repetition_signals_short_docs(spark):
    # 1-word doc: no bigrams/trigrams -> 0.0, not null/missing.
    df = _docs(spark, [(1, "solo"), (2, "two words")])
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert rows[1].top_word_frac == 1.0
    assert rows[1].top_bigram_frac == 0.0
    assert rows[1].dup_trigram_frac == 0.0
    assert rows[2].top_bigram_frac == 1.0
    assert rows[2].dup_trigram_frac == 0.0


def test_ngram_contamination_counts_distinct_shared(spark):
    train = _docs(
        spark,
        [
            (1, "p q r s t u"),   # shares "p q r" and "q r s" with eval
            (2, "zz yy xx ww"),   # clean
            (3, "p q r p q r"),   # duplicated gram counts once (distinct)
        ],
    )
    eval_df = _docs(spark, [(100, "p q r s")])
    out = {r.doc_id: r.n_shared_grams
           for r in ngram_contamination(train, eval_df, n=3).collect()}
    assert out == {1: 2, 3: 1}


def test_winnowing_guarantee(spark):
    # SIGMOD'03 guarantee with k=4, w=4: any shared run of w+k-1=7 words
    # yields at least one shared fingerprint.
    shared = "alpha beta gamma delta epsilon zeta eta"
    df = _docs(
        spark,
        [
            (1, f"one two three {shared} four five six"),
            (2, f"{shared} completely different tail words here"),
            (3, "nothing in common with the others at all"),
        ],
    )
    fps = winnow_fingerprints(df, k=4, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[1] & by_doc[2], "docs sharing a 7-word run must share a fp"
    assert not (by_doc[1] & by_doc[3])


def test_winnowing_short_and_empty_docs(spark):
    df = _docs(spark, [(1, "only three words"), (2, ""), (3, "a b c d e")])
    rows = winnow_fingerprints(df, k=4, w=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.fingerprint)
    assert 1 not in by_doc        # fewer than k words -> no grams -> no rows
    assert 2 not in by_doc        # empty doc -> no rows
    assert len(by_doc[3]) == 1    # 2 grams < w -> single global-min fp


def test_winnowing_compression(spark):
    text = " ".join(f"w{i}" for i in range(200))
    df = _docs(spark, [(1, text)])
    n = winnow_fingerprints(df, k=4, w=4).count()
    # expect ~2/(w+1) of 197 gram hashes kept; allow generous slack
    assert 30 <= n <= 120


def test_winnowing_rejects_bad_params(spark):
    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, w=0)


def test_winnow_crossdoc_finds_containment(spark):
    # A lifted paragraph inside otherwise-unrelated documents: the
    # whole-doc resemblance is tiny (MinHash territory would miss it at
    # any usual threshold) but the pair must surface via shared
    # fingerprints of the verbatim run.
    lifted = " ".join(f"quote{i}" for i in range(20))
    df = _docs(
        spark,
        [
            (1, "intro words here " + lifted + " closing remarks one"),
            (2, "totally separate opening " + lifted + " other ending text"),
            (3, "no overlap with anything " + " ".join(f"x{i}" for i in range(20))),
        ],
    )
    rows = winnow_crossdoc_pairs(df, k=4, w=4, min_shared=1, max_fp_docs=None).collect()
    pairs = {(r.doc_a, r.doc_b): r.n_shared for r in rows}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(3 not in p for p in pairs)


def test_winnow_crossdoc_cap_is_subset_and_undercounts(spark):
    # A hot span shared by ALL docs is dropped by the cap; a pair that
    # also shares a rare span survives with an under-counted n_shared,
    # and capped output is a subset of uncapped output.
    hot = " ".join(f"boiler{i}" for i in range(10))
    rare = " ".join(f"rare{i}" for i in range(10))
    rows = [(i, f"{hot} filler{i} mid{i} words{i}") for i in range(1, 7)]
    rows += [(7, f"{hot} {rare} tail seven words"), (8, f"{hot} {rare} other eight end")]
    df = _docs(spark, rows)
    uncapped = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_crossdoc_pairs(
            df, k=4, w=4, min_shared=1, max_fp_docs=None
        ).collect()
    }
    capped = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_crossdoc_pairs(
            df, k=4, w=4, min_shared=1, max_fp_docs=4
        ).collect()
    }
    assert set(capped) <= set(uncapped)
    assert (7, 8) in capped
    assert capped[(7, 8)] <= uncapped[(7, 8)]
    # the hot-span-only pairs are gone under the cap
    assert (1, 2) in uncapped and (1, 2) not in capped


def test_winnow_crossdoc_rejects_bad_params(spark):
    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        winnow_crossdoc_pairs(df, min_shared=0)
    with pytest.raises(ValueError):
        winnow_crossdoc_pairs(df, max_fp_docs="bogus")


def _py_buckets(text, n_buckets, ngram_max):
    import hashlib

    words = text.split()
    out = []
    for n in range(1, ngram_max + 1):
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        out += [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets
            for g in grams
        ]
    return out


def test_hashed_feature_buckets_matches_python_oracle(spark):
    text = "the quick brown fox the quick"
    df = _docs(spark, [(1, text)])
    got = df.select(
        hashed_feature_buckets("text", n_buckets=64, ngram_max=2).alias("b")
    ).first().b
    assert got == _py_buckets(text, 64, 2)


def test_hashed_linear_score_matches_python_oracle(spark):
    import math

    texts = {1: "good words here", 2: "bad", 3: "good good good words"}
    n_buckets = 32
    wmap = {b: (b % 7) / 7.0 - 0.5 for b in range(0, n_buckets, 2)}  # sparse
    df = _docs(spark, list(texts.items()))
    weights = spark.createDataFrame(
        [(b, w) for b, w in wmap.items()], "bucket int, weight double"
    )
    out = {
        r.doc_id: r
        for r in hashed_linear_score(
            df, weights, n_buckets=n_buckets, ngram_max=2, bias=0.1
        ).collect()
    }
    for did, text in texts.items():
        feats = _py_buckets(text, n_buckets, 2)
        mean_w = sum(wmap.get(b, 0.0) for b in feats) / len(feats)
        want = 1.0 / (1.0 + math.exp(-(mean_w + 0.1)))
        assert out[did].n_feats == len(feats)
        assert out[did].score == pytest.approx(want, rel=1e-12)


def test_hashed_linear_score_empty_doc_absent(spark):
    df = _docs(spark, [(1, "some text"), (2, "   ")])
    weights = spark.createDataFrame([(0, 1.0)], "bucket int, weight double")
    got = {r.doc_id for r in hashed_linear_score(df, weights).collect()}
    assert got == {1}


def test_hashed_linear_score_validates_params(spark):
    df = _docs(spark, [(1, "a")])
    w = spark.createDataFrame([(0, 1.0)], "bucket int, weight double")
    with pytest.raises(ValueError):
        hashed_linear_score(df, w, n_buckets=1)
    with pytest.raises(ValueError):
        hashed_linear_score(df, w, ngram_max=0)


def test_ngram_contamination_no_broadcast_path(spark):
    train = _docs(spark, [(1, "a b c")])
    eval_df = _docs(spark, [(2, "a b c")])
    out = ngram_contamination(train, eval_df, n=3, broadcast_eval=False).collect()
    assert [(r.doc_id, r.n_shared_grams) for r in out] == [(1, 1)]


def test_curation_pipeline_dedup_and_filters(spark, tmp_path):
    """The curation composition on crafted rows: the exact-dedup stage
    keeps the min doc_id of an identical-text pair (the sf0.01 corpus
    has no exact dups, so the catalog oracle can't exercise this arm),
    and the token-count / language filters drop out-of-range and
    marker-free docs."""
    from mlx_vector_db_spark.queries import q_curation_pipeline

    en = "the quick brown fox and the lazy dog of the town " * 3  # 33 toks
    rows = [
        (1, en),                      # kept
        (5, en),                      # exact dup of 1 -> dropped (5 > 1)
        (2, en + "extra"),            # kept (34 tokens, distinct fp)
        (3, "short of the text"),     # 4 tokens -> dropped by range
        (4, "zz yy xx ww vv " * 5),   # no lang markers -> 'und' -> dropped
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = q_curation_pipeline(spark, str(tmp_path)).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [1, 2]
    assert all(r["lang_pred"] == "en" for r in out)
    assert out[0]["n_tokens"] == 33 and out[1]["n_tokens"] == 34


def test_repeated_spans_counts(spark):
    """Hand-computed: a 6-gram shared by two docs (one doc has it
    twice) is mined with (n_docs=2, n_occurrences=3); spans unique to
    one doc are excluded at min_docs=2."""
    from mlx_vector_db_spark.operators.quality import repeated_spans

    span = "a b c d e f"
    rows = [
        (1, span + " tail1 tail2"),
        (2, "head " + span + " " + span),  # overlapping repeats: 2 occurrences
        (3, "entirely different words here now ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["gram"]: r for r in repeated_spans(docs, n=6, min_docs=2).collect()}
    assert span in out
    assert out[span]["n_docs"] == 2 and out[span]["n_occurrences"] == 3
    # doc 3's grams are solo -> absent
    assert all(g.split()[0] not in ("entirely",) for g in out)


def test_unigram_lm_scores_hand_oracle(spark):
    """Laplace-smoothed unigram NLL against a pure-Python recomputation,
    including OOV handling, the self-trained default, case folding, and
    NULL/empty docs."""
    import math

    from mlx_vector_db_spark.operators.quality import unigram_lm_scores

    ref_rows = [(100, "a a b"), (101, "B c")]
    doc_rows = [(1, "a b"), (2, "zz a"), (3, ""), (4, None)]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")

    counts = {"a": 2, "b": 2, "c": 1}    # lowercased reference
    total, vocab, alpha = 5, 3, 1.0
    denom = total + alpha * (vocab + 1)

    def nll(tok):
        return -math.log((counts.get(tok, 0) + alpha) / denom)

    got = {r["doc_id"]: r for r in
           unigram_lm_scores(docs, ref_df=ref).collect()}
    exp1 = (nll("a") + nll("b")) / 2
    exp2 = (nll("zz") + nll("a")) / 2
    assert got[1]["n_tokens"] == 2 and abs(got[1]["avg_nll"] - exp1) < 1e-9
    assert got[2]["n_tokens"] == 2 and abs(got[2]["avg_nll"] - exp2) < 1e-9
    assert got[2]["avg_nll"] > got[1]["avg_nll"]      # OOV scores worse
    for d in (3, 4):
        assert got[d]["n_tokens"] == 0 and got[d]["avg_nll"] is None
    assert abs(got[1]["perplexity"] - math.exp(exp1)) < 1e-9

    # self-trained default: ref = df itself
    selfed = {r["doc_id"]: r["avg_nll"] for r in
              unigram_lm_scores(docs.where("text IS NOT NULL")).collect()}
    c2 = {"a": 2, "b": 1, "zz": 1}
    t2, v2 = 4, 3
    d2 = t2 + 1.0 * (v2 + 1)
    e1 = -(math.log((2 + 1) / d2) + math.log((1 + 1) / d2)) / 2
    assert abs(selfed[1] - e1) < 1e-9


def test_bigram_lm_scores_hand_oracle(spark):
    import math

    from mlx_vector_db_spark.operators.quality import bigram_lm_scores

    d = spark.createDataFrame(
        [(1, "a b a b"), (2, None), (3, "  "), (4, "zz a")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r for r in bigram_lm_scores(d, d.where("doc_id = 1")).collect()
    }
    # ref "a b a b": uni a:2 b:2 (total 4, V=2); bi (a,b):2 (b,a):1;
    # ctx a:2 b:1. Laplace alpha=1, lam=0.7.
    p_a = 3 / 7  # (2+1)/(4+3)
    p_b_after_a = 0.7 * (2 + 1) / (2 + 3) + 0.3 * p_a
    p_a_after_b = 0.7 * (1 + 1) / (1 + 3) + 0.3 * p_a
    want1 = -(
        math.log(p_a)
        + math.log(p_b_after_a)
        + math.log(p_a_after_b)
        + math.log(p_b_after_a)
    ) / 4
    assert out[1].n_tokens == 4
    assert out[1].avg_nll == pytest.approx(want1, abs=1e-12)
    assert out[1].perplexity == pytest.approx(math.exp(want1), abs=1e-9)
    # NULL and whitespace-only docs: zero tokens, NULL scores (no
    # phantom row from arrays_zip padding)
    for empty_id in (2, 3):
        assert out[empty_id].n_tokens == 0
        assert out[empty_id].avg_nll is None
    # doc 4 "zz a": OOV first token = unigram smoothing slot 1/(V+1);
    # then a after unseen context zz: ctx=0, bi=0
    p_zz = 1 / 7
    p_a_after_zz = 0.7 * 1 / 3 + 0.3 * p_a
    want4 = -(math.log(p_zz) + math.log(p_a_after_zz)) / 2
    assert out[4].avg_nll == pytest.approx(want4, abs=1e-12)


def test_bigram_lm_repetition_scores_below_shuffled(spark):
    # the bigram model's reason to exist: word-ORDER sensitivity.
    # Same bag of words, coherent vs scrambled order -> lower avg_nll
    # for the order the reference corpus exhibits.
    from mlx_vector_db_spark.operators.quality import bigram_lm_scores

    ref = spark.createDataFrame(
        [(100 + i, "the cat sat on the mat") for i in range(5)],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "mat the on sat cat the")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.avg_nll for r in bigram_lm_scores(probe, ref).collect()}
    assert out[1] < out[2]


def test_calibrate_keep_threshold(spark):
    from mlx_vector_db_spark.operators.quality import calibrate_keep_threshold

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "doc_id long, score double"
    )
    cal, kept = calibrate_keep_threshold(df, "score", 0.25, exact=True)
    row = cal.first()
    # keep top 25% of 0..99: threshold = percentile(0.75) = 74.25
    assert row.threshold == pytest.approx(74.25)
    assert row.n_total == 100 and row.n_kept == 25
    assert {r.doc_id for r in kept.collect()} == set(range(75, 100))
    # lower-is-better flips the side
    cal2, kept2 = calibrate_keep_threshold(
        df, "score", 0.1, higher_is_better=False, exact=True
    )
    assert {r.doc_id for r in kept2.collect()} == set(range(10))
    # the approx sketch lands near the exact cut at default accuracy
    cal3, _ = calibrate_keep_threshold(df, "score", 0.25)
    assert abs(cal3.first().threshold - 74.25) <= 2.0
    with pytest.raises(ValueError, match="keep_fraction"):
        calibrate_keep_threshold(df, "score", 0.0)
