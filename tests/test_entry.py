"""Local replica of the driver's correctness gate: run every declared
query on Spark AND its DuckDB oracle at sf0.01, compare row count,
column names, and order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as E

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_medium):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_medium}/{t}.parquet')"
        )
    return con


def _canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        # guard against -0.0 vs 0.0 and repr noise beyond rounding
        return f"{val + 0.0:.9g}"
    return str(val)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"query_id", "vec_id", "rank", "score"}


def test_every_oracle_key_has_query():
    q, o = E.queries(), E.oracle_sql()
    assert set(o) <= set(q)


ORACLE_NAMES = sorted(E.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, ddb, sf_medium, name):
    sdf = E.queries()[name](spark, sf_medium)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(E.oracle_sql()[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(ddb_rows), f"{name}: row counts differ"
    assert _rowset(spark_cols, spark_rows) == _rowset(ddb_cols, ddb_rows), (
        f"{name}: values differ"
    )


ROWS_ONLY = sorted(set(E.queries()) - set(E.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_medium, name):
    df = E.queries()[name](spark, sf_medium)
    n = df.count()
    assert n >= 0
    if name in {"minhash_neardup_pairs", "simhash_neardup_pairs",
                "chunk_documents", "ivf_knn", "rag_pipeline"}:
        assert n > 0, f"{name} expected non-empty output at sf0.01"


def test_label_centroids_numpy_oracle(spark, sf_small):
    """The array-returning centroid OPERATOR vs a driver-side numpy mean
    (the catalog entry carries the scalar long shape — VERDICT r12 #1;
    the array form keeps its oracle here)."""
    import numpy as np

    from mlx_vector_db_spark.operators.centroids import label_centroids

    emb_df = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    out = {r["label"]: r for r in label_centroids(emb_df).collect()}
    emb = emb_df.collect()
    by_label = {}
    for r in emb:
        by_label.setdefault(r["label"], []).append(r["embedding"])
    assert set(out) == set(by_label)
    for lab, vecs in by_label.items():
        X = np.asarray(vecs, dtype=np.float64)
        want = X.mean(axis=0)
        got = np.asarray(out[lab]["centroid"])
        assert out[lab]["n_vectors"] == len(vecs)
        np.testing.assert_allclose(got, np.round(want, 6), atol=1.1e-6)
        assert out[lab]["centroid_norm"] == pytest.approx(
            float(np.linalg.norm(want)), abs=2e-6
        )


def test_label_centroids_entry_is_scalar_long_form(spark, sf_small):
    """The catalog ENTRY emits the driver-hashable long shape: scalar
    columns only, values equal to the array operator's unrolled rows."""
    import numpy as np

    from mlx_vector_db_spark.operators.centroids import label_centroids
    from mlx_vector_db_spark.queries import QUERIES

    df = QUERIES["label_centroids"](spark, sf_small)
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from oracle_sweep import non_scalar_columns

    assert non_scalar_columns(df.schema) == []
    rows = df.collect()
    emb_df = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    arr = {r["label"]: r for r in label_centroids(emb_df).collect()}
    for r in rows:
        a = arr[r["label"]]
        assert r["m"] == pytest.approx(a["centroid"][r["pos"]], abs=1.1e-6)
        assert r["n_vectors"] == a["n_vectors"]
        assert r["centroid_norm"] == pytest.approx(
            a["centroid_norm"], abs=1.1e-6
        )
    dim = len(arr[rows[0]["label"]]["centroid"])
    assert len(rows) == len(arr) * dim


def test_sweep_lint_flags_complex_columns(spark):
    """The sweep's catalog-contract lint rejects array/map/struct
    top-level columns and passes scalars."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from oracle_sweep import non_scalar_columns

    bad = spark.createDataFrame(
        [(1, [1.0], {"a": 1}, (1,))],
        "id long, arr array<double>, mp map<string,int>, st struct<x:int>",
    )
    assert non_scalar_columns(bad.schema) == ["arr", "mp", "st"]
    good = spark.createDataFrame([(1, "x", 1.5)], "id long, s string, f double")
    assert non_scalar_columns(good.schema) == []
