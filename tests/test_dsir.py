"""Unit tests for DSIR importance resampling; sf0.01 oracle equivalence
(`dsir_weights`, `dsir_gumbel_sample`) is covered by the catalog sweep."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.dsir import (
    dsir_log_weights,
    dsir_resample,
    gumbel_key,
)

B = 64  # small bucket space so collisions are exercised too


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % B


def _grams(text: str) -> list[str]:
    ws = re.split(r"\s+", text.strip()) if text.strip() else []
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _py_log_weights(
    raw: list[tuple[int, str]], target: list[tuple[int, str]], alpha: float = 1.0
) -> dict[int, float]:
    t_counts: Counter[int] = Counter()
    q_counts: Counter[int] = Counter()
    for _, text in target:
        t_counts.update(_bucket(g) for g in _grams(text))
    for _, text in raw:
        q_counts.update(_bucket(g) for g in _grams(text))
    t_tot, q_tot = sum(t_counts.values()), sum(q_counts.values())
    out: dict[int, float] = {}
    for doc_id, text in raw:
        gs = _grams(text)
        if not gs:
            continue
        out[doc_id] = sum(
            math.log(t_counts[_bucket(g)] + alpha)
            - math.log(t_tot + alpha * B)
            - math.log(q_counts[_bucket(g)] + alpha)
            + math.log(q_tot + alpha * B)
            for g in gs
        )
    return out


@pytest.fixture(scope="module")
def corpora(spark):
    # two token universes: "code-ish" target vs mixed raw pool
    target = [(100 + i, f"def fn{i % 3} return x{i % 2} value") for i in range(20)]
    raw = [(i, f"def fn{i % 3} yield x{i % 2} value") for i in range(15)] + [
        (50 + i, f"the quick brown fox {i % 5} jumps") for i in range(15)
    ]
    raw.append((99, "   "))  # zero-token doc: must be absent from output
    t = spark.createDataFrame(target, "doc_id long, text string")
    r = spark.createDataFrame(raw, "doc_id long, text string")
    return r, t, raw, target


def test_log_weights_match_python_oracle(corpora):
    r, t, raw, target = corpora
    got = {
        row.doc_id: row.log_weight
        for row in dsir_log_weights(r, t, n_buckets=B).collect()
    }
    want = _py_log_weights(raw, target)
    assert set(got) == set(want)  # doc 99 (whitespace-only) absent
    assert 99 not in got
    for doc_id, lw in want.items():
        assert got[doc_id] == pytest.approx(lw, abs=1e-9), doc_id


def test_target_like_docs_rank_higher(corpora):
    r, t, *_ = corpora
    w = dsir_log_weights(r, t, n_buckets=B)
    avg = {
        bool(row.codeish): row.m
        for row in w.groupBy((F.col("doc_id") < 50).alias("codeish"))
        .agg(F.avg("log_weight").alias("m"))
        .collect()
    }
    assert avg[True] > avg[False]


def test_resample_deterministic_under_repartition(corpora):
    r, t, *_ = corpora
    a = sorted(row.doc_id for row in dsir_resample(r, t, 10, n_buckets=B).collect())
    b = sorted(
        row.doc_id
        for row in dsir_resample(r.repartition(7), t, 10, n_buckets=B).collect()
    )
    assert a == b


def test_resample_hard_selection_is_top_by_weight(corpora):
    r, t, *_ = corpora
    w = dsir_log_weights(r, t, n_buckets=B)
    want = [
        row.doc_id
        for row in w.orderBy(F.col("log_weight").desc(), "doc_id").limit(5).collect()
    ]
    got = [
        row.doc_id
        for row in dsir_resample(r, t, 5, n_buckets=B, gumbel=False).collect()
    ]
    assert got == want


def test_gumbel_key_matches_python(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    got = {
        r.doc_id: r.g
        for r in df.select("doc_id", gumbel_key("doc_id", "s").alias("g")).collect()
    }
    eps = 1.0 / float(1 << 33)
    for i in range(50):
        u = int(hashlib.md5(f"s{i}".encode()).hexdigest()[:8], 16) / float(1 << 32)
        u = min(max(u, eps), 1.0 - eps)
        assert got[i] == pytest.approx(-math.log(-math.log(u)), abs=1e-12)


def test_salt_changes_selection(corpora):
    r, t, *_ = corpora
    a = {row.doc_id for row in dsir_resample(r, t, 8, n_buckets=B, salt="a").collect()}
    b = {row.doc_id for row in dsir_resample(r, t, 8, n_buckets=B, salt="b").collect()}
    assert a != b  # 8-of-30 draws under independent noise: collision ~0


def test_validation_errors(corpora):
    r, t, *_ = corpora
    with pytest.raises(ValueError):
        dsir_log_weights(r, t, n_buckets=1)
    with pytest.raises(ValueError):
        dsir_log_weights(r, t, alpha=0.0)
    with pytest.raises(ValueError):
        dsir_resample(r, t, 0)
