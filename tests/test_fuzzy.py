"""Blocked fuzzy matching: parity with a naive within-block oracle,
blocking semantics, and the length-prune never drops a true pair."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.fuzzy import blocked_fuzzy_pairs


@pytest.fixture(scope="module")
def names(spark):
    rows = [
        (1, "A", "chocolate lace"),
        (2, "A", "chocolate lace"),      # dist 0 to 1
        (3, "A", "chocolate lacy"),      # dist 1 to 1/2
        (4, "A", "vanilla swirl"),       # far from all
        (5, "B", "chocolate lace"),      # same text, DIFFERENT block
        (6, "B", "chocolate face"),      # dist 1 to 5
        (7, "A", "chocolate lake pie"),  # length diff 4 from "chocolate lace"
    ]
    return spark.createDataFrame(rows, "id long, brand string, name string")


def test_matches_naive_oracle(names):
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in blocked_fuzzy_pairs(
            names, "name", "id", "brand", max_distance=2
        ).collect()
    }
    a = names.alias("a")
    b = names.alias("b")
    naive = {
        (r["id_a"], r["id_b"], r["d"])
        for r in (
            a.join(b, F.col("a.brand") == F.col("b.brand"))
            .where(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.levenshtein("a.name", "b.name").alias("d"),
            )
            .where("d <= 2")
        ).collect()
    }
    assert got == naive
    assert (1, 2, 0) in got and (1, 3, 1) in got and (2, 3, 1) in got
    # cross-block identical text never pairs (blocking semantics)
    assert not any({x[0], x[1]} == {1, 5} for x in got)
    # same-block distance-1 pair in B found
    assert (5, 6, 1) in got


def test_length_prune_is_sound(names):
    """Raising max_distance past the length gap admits the pair the
    bound correctly excluded at 2 (|14-18|=4 > 2)."""
    wide = blocked_fuzzy_pairs(names, "name", "id", "brand", max_distance=5)
    pairs = {(r["id_a"], r["id_b"]) for r in wide.collect()}
    assert (1, 7) in pairs
    narrow = blocked_fuzzy_pairs(names, "name", "id", "brand", max_distance=2)
    assert (1, 7) not in {(r["id_a"], r["id_b"]) for r in narrow.collect()}


def test_bad_args(names):
    with pytest.raises(ValueError, match="max_distance"):
        blocked_fuzzy_pairs(names, "name", "id", "brand", max_distance=-1)
    with pytest.raises(ValueError, match="blocking column"):
        blocked_fuzzy_pairs(names, "name", "id", [], max_distance=1)
