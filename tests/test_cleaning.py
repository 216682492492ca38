"""PII redaction + corpus boilerplate removal, vs hand-computed oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.cleaning import (
    line_frequencies,
    pii_counts,
    redact_pii,
    remove_boilerplate_lines,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_redact_pii_all_kinds(spark):
    df = _docs(
        spark,
        [
            (
                1,
                "mail a.user+tag@example.co.uk ssn 123-45-6789 "
                "ip 10.0.255.1 phone +1 (415) 555-1234 end",
            )
        ],
    )
    out = df.select(redact_pii("text").alias("t")).first().t
    assert out == "mail <EMAIL> ssn <SSN> ip <IP> phone <PHONE> end"


def test_redact_pii_precedence_ssn_before_phone(spark):
    # an SSN must become <SSN>, never be half-eaten by the phone pattern
    df = _docs(spark, [(1, "call 555-123-4567 or ssn 987-65-4321")])
    out = df.select(redact_pii("text").alias("t")).first().t
    assert "<SSN>" in out and "<PHONE>" in out
    assert "987" not in out and "555" not in out


def test_redact_pii_leaves_clean_text_alone(spark):
    df = _docs(spark, [(1, "nothing sensitive here 123 456")])
    assert df.select(redact_pii("text").alias("t")).first().t == (
        "nothing sensitive here 123 456"
    )


def test_pii_counts(spark):
    df = _docs(
        spark,
        [(1, "a@b.io and c@d.org, ip 1.2.3.4; no phone")],
    )
    row = df.select(*pii_counts("text")).first()
    assert (row.email_n, row.ssn_n, row.ip_n, row.phone_n) == (2, 0, 1, 0)


def test_pii_unknown_kind_rejected(spark):
    with pytest.raises(ValueError):
        redact_pii("text", kinds=["email", "passport"])


BOILER = "subscribe to our newsletter"


def test_remove_boilerplate_lines(spark):
    df = _docs(
        spark,
        [
            (1, f"unique first line\n{BOILER}\nanother unique line"),
            (2, f"{BOILER}\ndoc two content"),
            (3, "totally original document"),
        ],
    )
    out = {r.doc_id: r for r in remove_boilerplate_lines(df, min_docs=2).collect()}
    assert out[1].text == "unique first line\nanother unique line"
    assert (out[1].n_lines_kept, out[1].n_lines_dropped) == (2, 1)
    assert out[2].text == "doc two content"
    assert out[3].text == "totally original document"
    assert out[3].n_lines_dropped == 0


def test_boilerplate_trim_insensitive_count(spark):
    # "  x  " and "x" are the same line for counting purposes
    df = _docs(spark, [(1, f"  {BOILER}  \nkeep me"), (2, BOILER)])
    out = {r.doc_id: r for r in remove_boilerplate_lines(df, min_docs=2).collect()}
    assert out[1].text == "keep me"
    assert out[2].text == ""
    assert out[2].n_lines_kept == 0


def test_boilerplate_repeats_within_one_doc_not_dropped(spark):
    # n_docs counts documents, not occurrences: a line repeated 5x in a
    # single doc is repetition (quality.repetition_signals' job), not
    # corpus boilerplate
    df = _docs(spark, [(1, "same\nsame\nsame"), (2, "other")])
    out = {r.doc_id: r.text for r in remove_boilerplate_lines(df, min_docs=2).collect()}
    assert out[1] == "same\nsame\nsame"


def test_blank_lines_exempt_and_order_preserved(spark):
    df = _docs(spark, [(1, "a\n\nb"), (2, "x\n\ny")])
    out = {r.doc_id: r.text for r in remove_boilerplate_lines(df, min_docs=2).collect()}
    assert out[1] == "a\n\nb"  # blank line shared by both docs survives


def test_line_frequencies(spark):
    df = _docs(spark, [(1, f"{BOILER}\nu1"), (2, f"{BOILER}\nu2"), (3, BOILER)])
    freq = {r.line_hash: r.n_docs for r in line_frequencies(df).collect()}
    assert sorted(freq.values(), reverse=True) == [3, 1, 1]


def test_min_docs_validated(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        remove_boilerplate_lines(df, min_docs=1)
