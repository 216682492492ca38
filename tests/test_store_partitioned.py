"""Cell-partitioned store layout: directory-level pruning
(PartitionFilters), appends land in cell subdirs, delete/optimize
preserve the layout, SQL view surface works.
"""

from __future__ import annotations

import hashlib

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
    subdirs = {p.name for p in store.data_dir.iterdir()
               if p.is_dir() and not p.name.startswith("_")}  # _manifests is metadata
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
    subdirs = {p.name for p in store.data_dir.iterdir()
               if p.is_dir() and not p.name.startswith("_")}  # _manifests is metadata
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


def _snap(paths):
    """(mtime_ns, size, md5) per file — content identity plus the mtime proxy."""
    out = {}
    for f in paths:
        st_ = f.stat()
        out[str(f)] = (
            st_.st_mtime_ns,
            st_.st_size,
            hashlib.md5(f.read_bytes()).hexdigest(),
        )
    return out


def test_partitioned_pruned_delete_preserves_untouched_files(spark, tmp_path):
    """Footer-stats pruning works under the Hive cell layout: deleting
    ids contained in one batch's files leaves the other batch's files
    byte-identical, and survivors keep their cell dirs.

    Note: supersede-time retention (store.py `_try_commit`) deliberately
    touches the mtime of files that LEAVE the live set so vacuum can age
    history by time-since-superseded — so the stability assertions are
    (a) mtime over the files still in the LIVE set and (b) content
    (size+md5) over every pre-existing file still on disk."""
    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    st = cat.create_store("pp", "m", dimension=DIM)
    centers = RNG.random((4, DIM)) * 3
    v1 = (centers[RNG.integers(0, 4, 100)] + 0.1 * RNG.standard_normal((100, DIM))).astype(np.float32)
    st.add_vectors(v1.tolist(), ids=list(range(100)))
    st.build_index(nlist=4, seed=2, partition_by_cell=True)
    # second disjoint-id batch AFTER partitioning: its files' id stats
    # don't overlap the first batch's
    v2 = (centers[RNG.integers(0, 4, 100)] + 0.1 * RNG.standard_normal((100, DIM))).astype(np.float32)
    st.add_vectors(v2.tolist(), ids=list(range(5000, 5100)))
    before = _snap(st.data_dir.glob("**/*.parquet"))
    live_before = {str(f) for f in st._data_files()}
    removed = st.delete_vectors(ids=[5003, 5007, 5050])
    assert removed == 3
    assert st.count() == 197
    after = _snap(st.data_dir.glob("**/*.parquet"))
    live_after = {str(f) for f in st._data_files()}
    # (a) files that stayed in the live set were not rewritten (mtime stable)
    carried_live = live_before & live_after
    assert len(carried_live) >= 1  # pruning actually skipped first-batch files
    for p in carried_live:
        assert after[p][0] == before[p][0], f"live file rewritten: {p}"
    # (b) every pre-existing file still on disk — live or retired history —
    # is byte-identical (retention may touch a retired file's mtime, never
    # its bytes)
    for p, (_, size, md5) in before.items():
        if p in after:
            assert after[p][1:] == (size, md5), f"content changed: {p}"
    # layout still Hive-partitioned and queryable via partition pruning
    subdirs = {p.name for p in st.data_dir.iterdir()
               if p.is_dir() and not p.name.startswith("_")}  # _manifests is metadata
    assert all(d.startswith("centroid_id=") for d in subdirs)
    assert st.to_df().where("id = 5003").count() == 0
    assert st.to_df().where("id = 3").count() == 1
    # centroid assignments survived the rewrite (non-null for all rows)
    assert st.to_df().where(F.col("centroid_id").isNull()).count() == 0


def test_partitioned_pruned_upsert(spark, tmp_path):
    cat = VectorStoreCatalog(spark, tmp_path / "stores")
    st = cat.create_store("pu", "m", dimension=DIM)
    centers = RNG.random((4, DIM)) * 3
    v1 = (centers[RNG.integers(0, 4, 100)] + 0.1 * RNG.standard_normal((100, DIM))).astype(np.float32)
    st.add_vectors(v1.tolist(), ids=list(range(100)))
    st.build_index(nlist=4, seed=2, partition_by_cell=True)
    v2 = (centers[RNG.integers(0, 4, 100)] + 0.1 * RNG.standard_normal((100, DIM))).astype(np.float32)
    st.add_vectors(v2.tolist(), ids=list(range(5000, 5100)))
    before = _snap(st.data_dir.glob("**/*.parquet"))
    live_before = {str(f) for f in st._data_files()}
    # update one id in the second batch's range; insert one beyond all
    target = centers[2].astype(np.float32)
    updated, inserted = st.upsert_vectors(
        [target.tolist(), (centers[1] + 0.05).astype(np.float32).tolist()],
        ids=[5010, 9999],
    )
    assert (updated, inserted) == (1, 1)
    assert st.count() == 201
    after = _snap(st.data_dir.glob("**/*.parquet"))
    live_after = {str(f) for f in st._data_files()}
    carried_live = live_before & live_after
    assert len(carried_live) >= 1
    for p in carried_live:
        assert after[p][0] == before[p][0], f"live file rewritten: {p}"
    for p, (_, size, md5) in before.items():
        if p in after:
            assert after[p][1:] == (size, md5), f"content changed: {p}"
    row = st.to_df().where("id = 5010").first()
    assert np.allclose(list(row["embedding"]), target, atol=1e-6)
    # the updated row's centroid matches its NEW embedding's cell
    ivf = st._ivf()
    assert row["centroid_id"] is not None
    # indexed probe query still finds the updated vector
    hit = st.query(target.tolist(), k=1, use_index=True, nprobe=4).first()
    assert hit["id"] == 5010
