"""SDK-facade workflow — the reference's integration test flow
(tests/test_integration.py:46-173) through the compatible client:
create -> add -> query (self-match > 0.999, filtered) -> batch -> count
-> delete-by-metadata -> delete store.
"""

from __future__ import annotations

import numpy as np
import pytest

from mlx_vector_db_spark.client import QueryResponse, VectorDBClient

DIM = 24
RNG = np.random.default_rng(77)


@pytest.fixture()
def client(spark, tmp_path):
    return VectorDBClient(spark, str(tmp_path / "stores"), default_dimension=DIM)


@pytest.fixture()
def loaded(client):
    client.create_store("u1", "m1", promoted_keys={"category": "string"})
    vecs = RNG.random((40, DIM)).astype(np.float32)
    meta = [
        {"category": "A" if i % 2 == 0 else "B", "note": f"n{i}"} for i in range(40)
    ]
    res = client.add_vectors("u1", "m1", vecs.tolist(), meta)
    assert res == {"status": "success", "vectors_added": 40}
    client._vecs = vecs
    return client


def test_full_workflow(loaded):
    # self-query: rank 1 is itself with similarity ~1 (reference golden
    # assertion, tests/test_integration.py:133-137)
    resp = loaded.query("u1", "m1", loaded._vecs[5].tolist(), k=3)
    assert isinstance(resp, QueryResponse)
    top = resp.results[0]
    assert top.id == 5 and top.similarity_score > 0.999 and top.rank == 1
    assert top.metadata["category"] == "B"
    assert top.metadata["note"] == "n5"

    # filtered query: every hit satisfies the filter (reference :139-161)
    resp = loaded.query(
        "u1", "m1", loaded._vecs[0].tolist(), k=5,
        filter_metadata={"category": "A"},
    )
    assert resp.results and all(r.metadata["category"] == "A" for r in resp.results)

    # batch query: one response per query, self-match first
    batch = loaded.batch_query(
        "u1", "m1", [loaded._vecs[1].tolist(), loaded._vecs[2].tolist()], k=2
    )
    assert [b.results[0].id for b in batch] == [1, 2]

    # stats / count
    assert loaded.count_vectors("u1", "m1").vectors == 40
    assert loaded.get_store_stats("u1", "m1").detail["metric"] == "cosine"

    # delete by metadata — the endpoint the reference never implemented
    removed = loaded.delete_vectors_by_metadata("u1", "m1", {"category": "B"})
    assert removed == 20
    assert loaded.count_vectors("u1", "m1").vectors == 20

    # store teardown
    assert loaded.delete_store("u1", "m1")["status"] == "deleted"
    assert not loaded.store_exists("u1", "m1")


def test_health_check(client):
    assert client.health_check()["status"] == "healthy"


def test_query_missing_store_raises(client):
    with pytest.raises(KeyError):
        client.query("ghost", "m", [0.0] * DIM)
