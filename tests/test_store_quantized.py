"""Quantized store: q8 codes written at ingest, two-pass query (int8
first pass reading only id+q8, exact re-rank) returns the exact-path
ids; first-pass scan is column-pruned.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.plans import explain_str
from mlx_vector_db_spark.store import VectorStoreCatalog

DIM = 32
N = 400
RNG = np.random.default_rng(53)


@pytest.fixture()
def qstore(spark, tmp_path):
    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    st = cat.create_store(
        "q", "m", dimension=DIM, quantize=True,
        promoted_keys={"category": "string"},
    )
    vecs = RNG.random((N, DIM)).astype(np.float32)
    st.add_vectors(
        vecs.tolist(),
        [{"category": "A" if i % 2 == 0 else "B"} for i in range(N)],
    )
    st._vecs = vecs
    return st


def test_codes_written_at_ingest(qstore):
    row = qstore.to_df().first()
    assert row["q8"] is not None
    assert len(row["q8"]["qvec"]) == DIM and row["q8"]["scale"] > 0


def test_two_pass_matches_exact(qstore):
    q = qstore._vecs[123].tolist()
    two_pass = [r["id"] for r in qstore.query(q, k=10, use_quantized=True).collect()]
    exact = [r["id"] for r in qstore.query(q, k=10, use_quantized=False).collect()]
    assert two_pass == exact
    assert two_pass[0] == 123


def test_two_pass_filtered(qstore):
    q = qstore._vecs[10].tolist()
    res = qstore.query(
        q, k=5, filter_metadata={"category": "B"}, use_quantized=True
    ).collect()
    exact = qstore.query(
        q, k=5, filter_metadata={"category": "B"}, use_quantized=False
    ).collect()
    assert [r["id"] for r in res] == [r["id"] for r in exact]
    assert all(r["category"] == "B" for r in res)


def test_first_pass_is_column_pruned(qstore):
    # the candidate subplan must scan only id + q8 (+ pushdown filter
    # cols), never the float embedding column
    q = qstore._vecs[0].tolist()
    plan = explain_str(qstore.query(q, k=5, use_quantized=True))
    scans = [l for l in plan.splitlines() if "ReadSchema" in l]
    pruned = [l for l in scans if "q8" in l and "embedding:array<float>" not in l]
    assert pruned, f"no pruned first-pass scan found in:\n{plan}"


def test_unquantized_store_ignores_flag(spark, tmp_path):
    cat = VectorStoreCatalog(spark, tmp_path / "s2")
    st = cat.create_store("p", "m", dimension=8)
    st.add_vectors([[float(i)] * 8 for i in range(1, 6)])
    got = st.query([1.0] * 8, k=2, use_quantized=True).collect()
    assert len(got) == 2  # plain exact path, no q8 column required


def test_batch_two_pass_matches_exact(spark, qstore):
    qdf = spark.createDataFrame(
        [(i, qstore._vecs[i].tolist()) for i in range(5)],
        "query_id long, embedding array<float>",
    )
    two = qstore.batch_query(qdf, k=5, use_quantized=True).collect()
    one = qstore.batch_query(qdf, k=5, use_quantized=False).collect()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["id"]) for r in rows)
    assert key(two) == key(one)
    top1 = {r["query_id"]: r["id"] for r in two if r["rank"] == 1}
    assert top1 == {i: i for i in range(5)}
