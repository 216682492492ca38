"""Text functions: chunker golden tests (pure-Python oracle), token/quality
expressions vs Python oracle, language heuristic, shingles, fingerprints.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.functions import text as TX


# --- chunker golden semantics (reference parity, mlx_lm_pipeline.py:696-723)

def py_oracle_chunks(text, size, overlap):
    """Independent reimplementation of the documented semantics."""
    if len(text) <= size:
        return [text]
    out, start = [], 0
    while start < len(text):
        end = min(start + size, len(text))
        chunk = text[start:end]
        if end < len(text):
            for p in [". ", "! ", "? ", "\n\n"]:
                i = chunk.rfind(p)
                if i > len(chunk) * 0.7:
                    chunk = chunk[: i + len(p)]
                    break
        out.append(chunk.strip())
        start = max(start + size - overlap, start + 1)
        if start >= len(text):
            break
    return out


SAMPLES = [
    "short text",
    "A sentence. " * 40,
    "Exclaim! " * 50 + "and a tail without punctuation " * 5,
    "nopunctuationatall" * 30,
    "Para one.\n\nPara two continues for a while. More words here! Yes? "
    * 12,
]


@pytest.mark.parametrize("size,overlap", [(200, 50), (400, 50), (300, 30)])
def test_chunk_text_matches_oracle(size, overlap):
    for s in SAMPLES:
        assert TX.chunk_text(s, size, overlap) == py_oracle_chunks(s, size, overlap)


def test_chunk_text_short_input_passthrough():
    assert TX.chunk_text("abc", 200, 50) == ["abc"]
    assert TX.chunk_text("", 200, 50) == [""]


def test_chunk_text_bad_params():
    with pytest.raises(ValueError):
        TX.chunk_text("x", 0, 0)
    with pytest.raises(ValueError):
        TX.chunk_text("x", 100, 100)


def test_chunk_documents_dataframe(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "doc_id long, text string"
    )
    got = (
        TX.chunk_documents(df, chunk_size=200, overlap=50)
        .orderBy("document_id", "chunk_index")
        .collect()
    )
    exp = []
    for i, s in enumerate(SAMPLES):
        for j, c in enumerate(py_oracle_chunks(s, 200, 50)):
            exp.append((i, j, c, len(c)))
    assert [(r["document_id"], r["chunk_index"], r["chunk_text"], r["chunk_length"]) for r in got] == exp


# --- token / quality expressions

def test_token_count_and_quality(spark):
    rows = [
        (0, "The quick brown fox, it jumps!"),
        (1, ""),
        (2, "   "),
        (3, "a b  c   d"),
        (4, "123 abc A1B2"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    q = TX.text_quality("t")
    got = {
        r["id"]: r
        for r in df.select(
            "id", TX.token_count("t").alias("n"), *[v.alias(k) for k, v in q.items()]
        ).collect()
    }
    assert got[0]["n"] == 6
    assert got[1]["n"] == 0 and got[2]["n"] == 0
    assert got[3]["n"] == 4
    assert got[0]["n_tokens"] == 6
    assert got[0]["stopword_ratio"] == pytest.approx(2 / 6)  # 'The', 'it'
    assert got[0]["punct_ratio"] == pytest.approx(2 / len(rows[0][1]))
    assert got[4]["digit_ratio"] == pytest.approx(5 / 12)
    assert got[2]["mean_token_len"] == 0.0


def test_language_detection(spark):
    rows = [
        (0, "the cat and the dog went to the house of it"),
        (1, "der hund und die katze ist nicht auf das haus"),
        (2, "le chat et la maison est une des pour que"),
        (3, "el perro y la casa es una que por para los"),
        (4, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r["id"]: r["lang"] for r in df.select("id", TX.detect_language("t").alias("lang")).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "und"}


def test_shingles(spark):
    df = spark.createDataFrame([(0, "a b c d"), (1, "a b"), (2, "")], "id long, t string")
    got = {r["id"]: r["s"] for r in df.select("id", TX.shingles("t", 3).alias("s")).collect()}
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["a b"]
    assert got[2] == []


def test_doc_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, " hello world "), (2, "different")],
        "id long, t string",
    )
    got = [r["f"] for r in df.select(TX.doc_fingerprint("t").alias("f")).collect()]
    assert got[0] == got[1] != got[2]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([(0, "abcd efghijkl x")], "id long, t string")
    # ceil(4/4)+ceil(8/4)+ceil(1/4) = 1+2+1
    assert df.select(TX.bpe_ish_token_count("t").alias("n")).first()["n"] == 4
