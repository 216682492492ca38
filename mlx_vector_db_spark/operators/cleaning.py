"""Corpus-cleaning operators for training-data pipelines: PII
redaction and corpus-level boilerplate (repeated-line) removal.

The reference engine (Theseus-AT/mlx-vector-db) has no text-cleaning
surface at all — these are north-star extensions a 100 TB pretraining
pipeline needs before anything reaches the tokenizer (the C4 paper's
"three-sentence / boilerplate" filters and standard PII scrubbing).

Design rules:
- Everything is pure JVM column expressions (`regexp_replace`,
  `split`, `explode`, `md5`) — no Python in the data path, the whole
  redaction chain stays inside one WholeStageCodegen span.
- Regexes are written in the RE2-compatible subset (no lookbehind, no
  backreferences) so the exact same pattern runs on Spark (Java regex)
  and the DuckDB oracle (RE2) with identical semantics.
- Line identity is `md5(trim(line))` — an engine-portable 128-bit
  fingerprint, so corpus-level line counts reproduce bit-for-bit on any
  engine and any cluster size.

Scale notes (100 TB):
- `redact_pii` is map-only — zero shuffle, scales linearly.
- `remove_boilerplate_lines` shuffles line *hashes* (16 bytes + count),
  never line text, and the boilerplate set (lines repeated across >=
  min_docs docs) is orders of magnitude smaller than the corpus — the
  anti-join side is broadcast-able; AQE picks that up from runtime
  stats. Rebuild is one groupBy(doc) with a collect_list of surviving
  lines — bounded by document size, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "redact_pii",
    "pii_counts",
    "line_frequencies",
    "remove_boilerplate_lines",
]

# Ordered: earlier patterns are replaced first, so e.g. an SSN is
# claimed by <SSN> before the looser phone pattern can see it. All
# RE2-safe (no lookaround/backreferences) for oracle parity.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    # leading alternation, not `\b\+?`: there is no word boundary
    # between a space and '+', so `\b\+?` would strand the '+' outside
    # the match ("call +1 (415)..." -> "+<PHONE>")
    ("phone", r"(?:\+\d{1,3}[-. ]?|\b)\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b"),
]


def redact_pii(text: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace PII spans with ``<KIND>`` placeholder tokens.

    Chained `regexp_replace` — one codegen'd projection, no shuffle, no
    UDF. ``kinds`` restricts/reorders which patterns apply (default:
    all of :data:`PII_PATTERNS` in declaration order, which is also the
    precedence order).
    """
    col = F.col(text) if isinstance(text, str) else text
    selected = _select_patterns(kinds)
    for kind, pattern in selected:
        col = F.regexp_replace(col, pattern, f"<{kind.upper()}>")
    return col


def pii_counts(text: Column | str, kinds: list[str] | None = None) -> list[Column]:
    """Per-kind match counts (``<kind>_n`` columns) for audit rollups.

    Counts are taken on the progressively-redacted text exactly as
    :func:`redact_pii` would see it, so overlapping patterns never
    double-count a span.
    """
    col = F.col(text) if isinstance(text, str) else text
    out = []
    for kind, pattern in _select_patterns(kinds):
        out.append(F.regexp_count(col, F.lit(pattern)).alias(f"{kind}_n"))
        col = F.regexp_replace(col, pattern, f"<{kind.upper()}>")
    return out


def _select_patterns(kinds: list[str] | None) -> list[tuple[str, str]]:
    if kinds is None:
        return PII_PATTERNS
    by_name = dict(PII_PATTERNS)
    unknown = [k for k in kinds if k not in by_name]
    if unknown:
        raise ValueError(f"unknown PII kinds {unknown}; known: {list(by_name)}")
    return [(k, by_name[k]) for k in kinds]


def line_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level line frequency table: ``(line_hash, n_docs)``.

    One distinct + one count aggregation over 16-byte md5 hashes — the
    only data shuffled is the hash, never the line text. `n_docs`
    counts *documents containing the line*, not occurrences, matching
    the C4 boilerplate rule ("lines that appear in multiple documents").
    """
    lines = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(F.split(F.col(text_col), "\n")).alias("_line"),
    ).select("_doc", F.md5(F.trim(F.col("_line"))).alias("line_hash"))
    return (
        lines.distinct()
        .groupBy("line_hash")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def remove_boilerplate_lines(
    df: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_chars: int = 1,
) -> DataFrame:
    """Drop every line that appears (trimmed-identical) in >=
    ``min_docs`` distinct documents — the C4-style boilerplate filter
    (nav bars, cookie banners, license headers) that exact-dup and
    near-dup *document* dedup both miss.

    Returns the input with ``text_col`` rebuilt from surviving lines
    (original order, original untrimmed spelling) plus ``n_lines_kept``
    / ``n_lines_dropped`` audit columns. Documents whose every line is
    boilerplate survive with empty text — dropping documents is a
    policy decision left to the caller.

    Lines shorter than ``min_line_chars`` after trimming are never
    counted as boilerplate (blank separator lines are structure, not
    content).

    Plan shape: explode → hash-only count agg → anti-join(line_hash) →
    groupBy(doc) rebuild. Two shuffles of hashes + one of surviving
    lines; the boilerplate side of the join is tiny and broadcast-able.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2 (got {min_docs})")
    lines = df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn("line_hash", F.md5(F.trim(F.col("_line"))))

    eligible = lines.where(F.length(F.trim(F.col("_line"))) >= min_line_chars)
    boiler = (
        eligible.select("_doc", "line_hash")
        .distinct()
        .groupBy("line_hash")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("line_hash")
    )

    # Blank/short lines are exempt from removal, so anti-join only the
    # eligible lines and union the exempt ones back.
    exempt = lines.where(F.length(F.trim(F.col("_line"))) < min_line_chars)
    kept = eligible.join(boiler, "line_hash", "left_anti").unionByName(exempt)

    rebuilt = kept.groupBy("_doc").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
        ).alias("_new_text"),
        F.count("*").cast("long").alias("n_lines_kept"),
    )

    n_lines = F.size(F.split(F.col(text_col), "\n")).cast("long")
    return (
        df.withColumn("_n_lines", n_lines)
        .join(rebuilt.withColumnRenamed("_doc", id_col), id_col, "left")
        .select(
            *[c for c in df.columns if c != text_col],
            F.coalesce(F.col("_new_text"), F.lit("")).alias(text_col),
            F.coalesce(F.col("n_lines_kept"), F.lit(0)).alias("n_lines_kept"),
            (F.col("_n_lines") - F.coalesce(F.col("n_lines_kept"), F.lit(0)))
            .cast("long")
            .alias("n_lines_dropped"),
        )
    )
