"""Connected components vs a pure-Python union-find oracle, and
cluster-aware dedup keeper semantics (transitive chains)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.components import (
    connected_components,
    dedup_keepers,
)


def uf_oracle(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node id per component
    comp = {}
    for x in {v for e in edges for v in e}:
        root = find(x)
        comp.setdefault(root, []).append(x)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )


def test_chain_collapses_to_one_component(spark):
    # 0-1, 1-2, 2-3: diameter 3, all one component labeled 0
    comp = connected_components(_pairs_df(spark, [(0, 1), (1, 2), (2, 3)]))
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}


def test_random_graph_matches_union_find(spark):
    rng = np.random.default_rng(13)
    n = 200
    edges = {tuple(sorted((int(a), int(b))))
             for a, b in rng.integers(0, n, (120, 2)) if a != b}
    comp = connected_components(_pairs_df(spark, sorted(edges)))
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert got == uf_oracle(n, sorted(edges))


def test_dedup_keepers_transitive(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    # chain 0~1~2 plus pair 4~5; doc 3 isolated
    pairs = _pairs_df(spark, [(0, 1), (1, 2), (4, 5)])
    kept = {r["doc_id"] for r in dedup_keepers(docs, pairs).collect()}
    assert kept == {0, 3, 4}


def test_two_cliques_stay_separate(spark):
    edges = [(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12)]
    comp = connected_components(_pairs_df(spark, edges))
    got = {r["node"]: r["component"] for r in comp.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}


def test_end_to_end_with_minhash_pairs(spark):
    """Real wiring: MinHash pairs -> components -> keepers on a corpus
    with a transitive near-dup chain A~B~C."""
    from mlx_vector_db_spark.operators.dedup import minhash_lsh_pairs

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon") * 2
    words = base.split()
    v1 = " ".join(words)
    v2 = " ".join(words[:-4] + ["w1", "w2", "w3", "w4"])        # ~ v1
    v3 = " ".join(["q1", "q2", "q3", "q4"] + words[4:-4] + ["w1", "w2", "w3", "w4"])  # ~ v2
    other = "completely different tokens " + " ".join(f"z{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(0, v1), (1, v2), (2, v3), (3, other)], "doc_id long, text string"
    )
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    kept = {r["doc_id"] for r in dedup_keepers(docs, pairs).collect()}
    assert 0 in kept and 3 in kept
    assert kept.isdisjoint({1, 2}) or len(kept) < 4  # chain collapsed


def test_component_safe_split_no_pair_straddles(spark):
    from mlx_vector_db_spark.operators.components import component_safe_split

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    # chains (0,1),(1,2) ... every 10th id: transitive groups of 3
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 200, 10)]
        + [(i + 1, i + 2) for i in range(0, 200, 10)],
        "id_a long, id_b long",
    )
    out = component_safe_split(docs, pairs).cache()
    try:
        assert out.count() == 200  # every doc assigned exactly once
        split_of = {r.doc_id: r.split for r in out.collect()}
        comp_of = {r.doc_id: r.component for r in out.collect()}
        for a, b in [(i, i + 1) for i in range(0, 200, 10)] + [
            (i + 1, i + 2) for i in range(0, 200, 10)
        ]:
            assert split_of[a] == split_of[b], (a, b)
            assert comp_of[a] == comp_of[b] == (a // 10) * 10
        # singletons: own component
        assert comp_of[5] == 5
        assert set(split_of.values()) <= {"train", "val", "test"}
    finally:
        out.unpersist()


def test_component_safe_split_deterministic_and_validated(spark):
    from mlx_vector_db_spark.operators.components import component_safe_split

    docs = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    a = sorted((r.doc_id, r.split) for r in component_safe_split(docs, pairs).collect())
    b = sorted(
        (r.doc_id, r.split)
        for r in component_safe_split(docs.repartition(7), pairs).collect()
    )
    assert a == b
    two = component_safe_split(
        docs, pairs, fractions={"fit": 0.5, "holdout": 0.5}
    )
    assert set(r.split for r in two.collect()) == {"fit", "holdout"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        component_safe_split(docs, pairs, fractions={})
    with _pytest.raises(ValueError):
        component_safe_split(docs, pairs, fractions={"a": 0.6, "b": 0.6})
    with _pytest.raises(ValueError):
        component_safe_split(docs, pairs, fractions={"a": 1.5, "b": -0.5})
