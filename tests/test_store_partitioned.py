"""Cell-partitioned store layout: directory-level pruning
(PartitionFilters), appends land in cell subdirs, delete/optimize
preserve the layout, SQL view surface works.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlx_vector_db_spark.plans import explain_str
from mlx_vector_db_spark.store import VectorStoreCatalog

DIM = 8
N = 300
RNG = np.random.default_rng(41)


@pytest.fixture()
def store(spark, tmp_path):
    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    st = cat.create_store("p", "m", dimension=DIM)
    centers = RNG.random((4, DIM)) * 3
    vecs = (
        centers[RNG.integers(0, 4, N)] + 0.1 * RNG.standard_normal((N, DIM))
    ).astype(np.float32)
    st.add_vectors(vecs.tolist())
    st.build_index(nlist=4, seed=2, partition_by_cell=True)
    st._vecs = vecs
    return st


def test_layout_is_hive_partitioned(store):
    subdirs = {p.name for p in store.data_dir.iterdir() if p.is_dir()}
    assert subdirs and all(d.startswith("centroid_id=") for d in subdirs)
    assert store.stats()["cell_partitioned"] is True
    assert store.count() == N


def test_probe_query_uses_partition_filters(store):
    q = store._vecs[5].tolist()
    plan = explain_str(store.query(q, k=3, use_index=True, nprobe=1))
    assert "PartitionFilters" in plan and "centroid_id" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]
    hit = store.query(q, k=1, use_index=True, nprobe=1).first()
    assert hit["id"] == 5


def test_append_lands_in_cell_subdir(store):
    before = store.count()
    store.add_vectors([store._vecs[0].tolist()])
    assert store.count() == before + 1
    row = store.to_df().orderBy(F.desc("id")).first()
    twin = store.to_df().where("id = 0").first()
    assert row["centroid_id"] == twin["centroid_id"]


def test_delete_and_optimize_preserve_layout(store):
    removed = store.delete_vectors(ids=[0, 1, 2])
    assert removed == 3 and store.count() == N - 3
    subdirs = {p.name for p in store.data_dir.iterdir() if p.is_dir()}
    assert all(d.startswith("centroid_id=") for d in subdirs)
    store.optimize()
    assert store.count() == N - 3
    assert store.stats()["cell_partitioned"] is True


def test_sql_view_surface(store, spark):
    view = store.create_view("vecs_p")
    q = store._vecs[7].tolist()
    arr = ", ".join(f"{x}D" for x in q)
    rows = spark.sql(
        f"SELECT id, vec_cosine(cast(embedding as array<double>), array({arr})) AS s "
        f"FROM {view} ORDER BY s DESC, id LIMIT 3"
    ).collect()
    assert rows[0]["id"] == 7 and rows[0]["s"] == pytest.approx(1.0, abs=1e-6)
