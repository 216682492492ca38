"""Blocked fuzzy matching: parity with a naive within-block oracle,
blocking semantics, and the length-prune never drops a true pair."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.operators.fuzzy import blocked_fuzzy_pairs, lsh_fuzzy_pairs


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
    with pytest.raises(ValueError, match="max_distance"):
        lsh_fuzzy_pairs(names, "name", "id", max_distance=-1)


# -- LSH candidates + exact-verify composition (the tier past blocking) ---


def test_lsh_fuzzy_pairs_parity_with_blocked_and_truth(spark, sf_small):
    """The documented scale layering composes end-to-end: char-shingle
    MinHash candidates -> exact levenshtein verify. Against the part
    table: precision 1.0 vs the all-pairs truth (emitted distances are
    exact by construction), recall >= 0.9, and it finds the cross-brand
    pairs blocking structurally cannot."""
    part = spark.read.parquet(f"{sf_small}/part.parquet")
    lsh = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in lsh_fuzzy_pairs(
            part, "p_name", "p_partkey", max_distance=2
        ).collect()
    }
    truth = {
        (r["id_a"], r["id_b"], r["d"])
        for r in (
            part.alias("a")
            .join(part.alias("b"), F.col("a.p_partkey") < F.col("b.p_partkey"))
            .select(
                F.col("a.p_partkey").alias("id_a"),
                F.col("b.p_partkey").alias("id_b"),
                F.levenshtein("a.p_name", "b.p_name").alias("d"),
            )
            .where("d <= 2")
        ).collect()
    }
    assert lsh <= truth                       # precision 1.0
    assert len(lsh & truth) / len(truth) >= 0.9
    blocked = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in blocked_fuzzy_pairs(
            part, "p_name", "p_partkey", "p_brand", max_distance=2
        ).collect()
    }
    assert blocked <= truth
    assert len(lsh - blocked) > 0             # cross-brand pairs recovered


@pytest.mark.slow
def test_skewed_block_wall_time_bounded(spark):
    """Scale-stress the quadratic-within-block ceiling: one block with
    10x the median rows (the adversarial shape for blocked self-joins).
    Both the blocked fuzzy join and blocked jaccard_pairs must finish
    the skewed corpus within a generous wall bound — the point is that
    cost is Σ block², not N², and a single hot block doesn't stall the
    job — and produce exact results on the hot block."""
    import time

    from mlx_vector_db_spark.operators.dedup import jaccard_pairs

    rows = []
    rid = 0
    # 40 cold blocks x 50 rows
    for b in range(40):
        for i in range(50):
            rows.append((rid, f"brand{b:02d}", f"widget model {b:02d} nr {i:04d}"))
            rid += 1
    # one hot block: 500 rows, many near-identical names
    for i in range(500):
        rows.append((rid, "hotbrand", f"widget model hot nr {i % 97:04d}"))
        rid += 1
    df = spark.createDataFrame(rows, "id long, brand string, name string").cache()
    df.count()

    t0 = time.time()
    fuzzy = blocked_fuzzy_pairs(df, "name", "id", "brand", max_distance=2)
    n_fuzzy = fuzzy.count()
    t_fuzzy = time.time() - t0
    # 500 identical-name rows in the hot block: every same-residue pair
    # is distance 0; residues repeat ceil(500/97) times
    assert n_fuzzy > 0
    assert t_fuzzy < 120, f"blocked fuzzy took {t_fuzzy:.0f}s on the skewed corpus"

    t0 = time.time()
    jac = jaccard_pairs(
        df, text_col="name", id_col="id", block_col="brand", threshold=0.5
    )
    n_jac = jac.count()
    t_jac = time.time() - t0
    assert n_jac > 0
    assert t_jac < 120, f"blocked jaccard took {t_jac:.0f}s on the skewed corpus"

    # exactness on the hot block: distance-0 pairs = same residue class
    hot = fuzzy.join(
        df.select(F.col("id").alias("id_a"), F.col("brand").alias("ba")), on="id_a"
    ).where(F.col("ba") == "hotbrand")
    n_hot_zero = hot.where("distance = 0").count()
    # residue r in 0..96: appears 6 times for r < 500-97*5=15, else 5
    import math
    expected = sum(math.comb(6, 2) if r < 15 else math.comb(5, 2) for r in range(97))
    assert n_hot_zero == expected


def test_fuzzy_pairs_dispatcher(spark):
    """fuzzy_pairs routes to the blocked tier when block_cols is given
    and the LSH tier otherwise; emitted pairs agree with the underlying
    tiers; LSH knobs on the blocked tier are a loud error."""
    from mlx_vector_db_spark.operators.fuzzy import (
        blocked_fuzzy_pairs,
        fuzzy_pairs,
        lsh_fuzzy_pairs,
    )

    rows = [
        (1, "b1", "widget deluxe model"),
        (2, "b1", "widget delux model"),    # 1 edit from id 1
        (3, "b1", "entirely different"),
        (4, "b2", "widget deluxe model"),   # same text, other block
    ]
    df = spark.createDataFrame(rows, "id long, brand string, name string")

    blocked = {(r["id_a"], r["id_b"], r["distance"]) for r in
               fuzzy_pairs(df, "name", "id", max_distance=2,
                           block_cols="brand").collect()}
    want_blocked = {(r["id_a"], r["id_b"], r["distance"]) for r in
                    blocked_fuzzy_pairs(df, "name", "id", "brand",
                                        max_distance=2).collect()}
    assert blocked == want_blocked == {(1, 2, 1)}

    lsh = {(r["id_a"], r["id_b"], r["distance"]) for r in
           fuzzy_pairs(df, "name", "id", max_distance=2,
                       num_hashes=32, bands=16).collect()}
    want_lsh = {(r["id_a"], r["id_b"], r["distance"]) for r in
                lsh_fuzzy_pairs(df, "name", "id", max_distance=2,
                                num_hashes=32, bands=16).collect()}
    assert lsh == want_lsh
    # unblocked tier can cross blocks: the identical (1, 4) pair appears
    assert (1, 4, 0) in lsh

    with pytest.raises(ValueError, match="no effect"):
        fuzzy_pairs(df, "name", "id", block_cols="brand", num_hashes=32)
