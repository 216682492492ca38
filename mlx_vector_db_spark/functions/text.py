"""Text-pipeline functions: chunking, token stats, quality scoring,
language ID, fingerprinting, shingling.

``chunk_text`` reproduces the reference's chunker behavior
(integrations/mlx_lm_pipeline.py:696-723): fixed-stride overlapping
character windows, preferring a break at the last sentence punctuation
('. ', '! ', '? ', '\\n\\n' — tried in that order) when that keeps >70%
of the window; the stride is ``chunk_size - overlap`` from the *window*
start regardless of where the break landed; chunks are stripped.

Everything else is the LLM-training-data-pipeline surface the rebuild
adds beyond the reference (SURVEY.md §7.3 milestone 6): token counting,
quality ratios, an n-gram/stopword language heuristic, document
fingerprints, and shingles for MinHash. All of it is column expressions
(JVM, codegen) except the chunker itself, which is an Arrow-batched
Pandas UDF (string slicing is genuinely imperative).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "chunk_text",
    "chunk_documents",
    "token_count",
    "tokens",
    "text_quality",
    "shingles",
    "shingles_from_tokens",
    "doc_fingerprint",
    "language_scores",
    "detect_language",
]

_PUNCTS = [". ", "! ", "? ", "\n\n"]


def chunk_text(text: str, chunk_size: int, overlap: int) -> list[str]:
    """Deterministic overlapping chunker, reference-parity (see module
    docstring). Pure Python so it is golden-testable without Spark."""
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be > 0, got {chunk_size}")
    if overlap < 0 or overlap >= chunk_size:
        raise ValueError(f"overlap must be in [0, chunk_size), got {overlap}")
    if text is None:
        return []
    if len(text) <= chunk_size:
        return [text]
    chunks: list[str] = []
    start = 0
    while start < len(text):
        end = min(start + chunk_size, len(text))
        chunk = text[start:end]
        if end < len(text):
            for punct in _PUNCTS:
                cut = chunk.rfind(punct)
                if cut > len(chunk) * 0.7:
                    chunk = chunk[: cut + len(punct)]
                    break
        chunks.append(chunk.strip())
        start = max(start + chunk_size - overlap, start + 1)
        if start >= len(text):
            break
    return chunks


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 400,
    overlap: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """documents -> chunks (reference index_documents chunking stage,
    integrations/mlx_lm_pipeline.py:646-694): one output row per chunk
    with ``document_id, chunk_index, chunk_text, chunk_length``.

    Pandas-UDF + explode: the UDF returns ``array<string>`` per doc (one
    Arrow batch at a time), and ``posexplode`` turns it into rows — the
    parallelism is per input partition, so a 100 TB documents table
    chunks with no shuffle at all.
    """
    # validate eagerly (the UDF would raise lazily inside executors)
    chunk_text("", chunk_size, overlap)

    @F.pandas_udf("array<string>")
    def _chunks(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: chunk_text(t, chunk_size, overlap))

    from mlx_vector_db_spark.rebalance import (
        LIGHT_KERNEL_SPLIT_BYTES,
        rebalance_for_compute,
    )

    return (
        rebalance_for_compute(
            docs, id_col, text_col, split_bytes=LIGHT_KERNEL_SPLIT_BYTES
        ).select(
            F.col(id_col).alias("document_id"),
            F.posexplode(_chunks(F.col(text_col))).alias("chunk_index", "chunk_text"),
        )
        .withColumn("chunk_length", F.length("chunk_text"))
    )


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization as an array column (empty string -> [])."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str, toks: Column | None = None) -> Column:
    """A BPE-ish proxy token count: word pieces of <=4 chars — i.e.
    ``sum(ceil(len(word)/4))`` — the standard cheap estimator when no
    tokenizer is shipped (the image has no tokenizer libs). ``toks`` as
    in :func:`text_quality` (pass a materialized token array when
    composing several token signals in one plan)."""
    if toks is None:
        toks = tokens(col)
    return F.aggregate(
        toks,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"),
    )


def text_quality(col: Column | str, toks: Column | None = None) -> dict[str, Column]:
    """Quality-scoring signals as named expressions (training-data
    filtering staples): char/token counts, mean token length,
    punctuation / digit / uppercase / whitespace ratios, and a
    stopword ratio over a small fixed English stopword list.

    Pass ``toks`` (a MATERIALIZED token-array column from a prior
    projection) when composing several token signals in one plan: the
    stopword/mean-length lambdas evaluate outside codegen CSE, so the
    inline ``tokens(col)`` default re-splits the text once per signal.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    if toks is None:
        toks = tokens(c)
    n_tokens = F.size(toks)
    nz = F.greatest(n_chars, F.lit(1)).cast("double")
    nt = F.greatest(n_tokens, F.lit(0)).cast("double")
    stop = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    n_stop = F.size(F.filter(toks, lambda w: F.lower(w).isin(*stop)))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.when(n_tokens > 0, (
            F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
            / nt
        )).otherwise(F.lit(0.0)),
        "punct_ratio": (
            n_chars - F.length(F.regexp_replace(c, r"[.,;:!?'\"()\[\]{}-]", ""))
        ).cast("double") / nz,
        "digit_ratio": (
            n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
        ).cast("double") / nz,
        "upper_ratio": (
            n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
        ).cast("double") / nz,
        "stopword_ratio": F.when(n_tokens > 0, n_stop.cast("double") / nt).otherwise(
            F.lit(0.0)
        ),
    }


#: tiny per-language marker lexicons for the language-ID heuristic.
#: (A real deployment would plug fastText/CLD3 into the same expression
#: shape; the heuristic keeps the operator dependency-free and
#: oracle-checkable.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "with", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "que", "por", "para"),
}


def language_scores(
    col: Column | str, toks: Column | None = None
) -> dict[str, Column]:
    """Per-language marker-hit ratio (hits / tokens), one column per
    language in :data:`LANG_MARKERS`. ``toks`` as in
    :func:`text_quality` — the four marker filters each re-split the
    text when tokenization is inline."""
    if toks is None:
        toks = tokens(col)
    nt = F.greatest(F.size(toks), F.lit(1)).cast("double")

    def hit_ratio(markers: tuple[str, ...]) -> Column:
        # NB: a real closure, not a default-arg lambda — PySpark inspects
        # lambda arity, and a second parameter would be bound to the
        # element *index* column.
        return (
            F.size(F.filter(toks, lambda w: F.lower(w).isin(*markers))).cast("double")
            / nt
        )

    return {lang: hit_ratio(markers) for lang, markers in LANG_MARKERS.items()}


def detect_language(
    col: Column | str, min_score: float = 0.0, toks: Column | None = None
) -> Column:
    """argmax over :func:`language_scores`, 'und' (undetermined) when no
    marker hits / below ``min_score``. Deterministic tie-break: language
    name ascending. ``toks`` as in :func:`text_quality`."""
    scores = language_scores(col, toks=toks)
    # struct comparison is field-order: score first, then -index, so a
    # score tie resolves to the alphabetically first language.
    pairs = F.array(
        *[
            F.struct(
                s.alias("score"), F.lit(-i).alias("prio"), F.lit(lang).alias("lang")
            )
            for i, (lang, s) in enumerate(sorted(scores.items()))
        ]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] > F.lit(min_score), best["lang"]).otherwise(
        F.lit("und")
    )


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """:func:`shingles` over an already-tokenized ``array<string>``
    column. Callers that can materialize the token array in its own
    projection first (``df.select(tokens(c).alias("_toks"))``) should:
    the per-index lambda below references the token array per shingle,
    and higher-order-function lambdas evaluate outside codegen CSE — an
    inline ``split()`` there is re-run for EVERY index (O(m·len) per
    doc, measured 4× slower on the documents table)."""
    k = F.lit(int(n))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    return F.array_distinct(
        F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(grams)
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (for MinHash / Jaccard). Texts with
    fewer than ``n`` tokens yield their whole token sequence as one
    shingle. Expression form — tokenizes inline; prefer
    :func:`shingles_from_tokens` over a materialized token column in
    DataFrame-level operators (see its docstring for why)."""
    return shingles_from_tokens(tokens(col), n)


def doc_fingerprint(col: Column | str) -> Column:
    """Canonical document fingerprint: md5 over the
    whitespace-normalized, lower-cased text. Oracle-friendly (md5 exists
    in every SQL engine) and stable across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))
