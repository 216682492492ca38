"""Model-based check of the store mutation surface: a randomized
sequence of add/upsert/delete/clear/optimize against a driver-side dict
model. After EVERY operation the store's (id -> embedding) contents must
equal the model exactly — this is the whole-protocol invariant the
manifest snapshot commit has to preserve across any interleaving, and
what a torn swap or a stale max-id cache would break first.

Auto-id prediction mirrors the documented cache contract (store.py
``_max_id_seen``): the base only grows while the handle is warm, deletes
may leave it above the true max (ids are sparse by contract), and
clear()/optimize() cold-start it to a true-max rescan.

Deterministic seeds (not hypothesis) so failures replay exactly; two
seeds x ~25 ops keeps the suite's wall-time bounded.
"""

from __future__ import annotations

import numpy as np
import pytest

from mlx_vector_db_spark.store import VectorStoreCatalog

DIM = 4


def _store_contents(st) -> dict[int, tuple[float, ...]]:
    return {
        r["id"]: tuple(round(float(x), 5) for x in r["embedding"])
        for r in st.to_df().select("id", "embedding").collect()
    }


def _vec(rng) -> list[float]:
    return [round(float(x), 5) for x in rng.uniform(-1, 1, DIM)]


@pytest.mark.parametrize("seed", [7, 23])
def test_random_mutation_sequence_matches_model(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    cat = VectorStoreCatalog(spark, tmp_path / "model")
    st = cat.create_store("m", f"s{seed}", dimension=DIM)
    model: dict[int, tuple[float, ...]] = {}
    max_seen: int | None = None  # mirrors the handle's _max_id_seen contract

    for step in range(25):
        op = rng.choice(
            ["add_auto", "add_ids", "upsert", "delete_ids", "clear", "optimize"],
            p=[0.3, 0.2, 0.2, 0.2, 0.05, 0.05],
        )
        if op == "add_auto":
            n = int(rng.integers(1, 6))
            vecs = [_vec(rng) for _ in range(n)]
            if max_seen is None:  # cold cache: the store rescans true max
                max_seen = max(model) if model else -1
            base = max_seen + 1
            st.add_vectors(vecs)
            for i, v in enumerate(vecs):
                model[base + i] = tuple(v)
            max_seen = base + n - 1
        elif op == "add_ids":
            n = int(rng.integers(1, 6))
            hi = (max(model) if model else 0) + 10
            ids = sorted(
                int(i) for i in rng.choice(hi + n * 3, size=n, replace=False)
                if int(i) not in model
            )
            if not ids:
                continue
            vecs = [_vec(rng) for _ in ids]
            st.add_vectors(vecs, ids=ids)
            for i, v in zip(ids, vecs):
                model[i] = tuple(v)
            if max_seen is not None:
                max_seen = max(max_seen, max(ids))
        elif op == "upsert":
            n = int(rng.integers(1, 6))
            pool = list(model) + [max(model, default=0) + j + 1 for j in range(3)]
            ids = sorted(set(int(rng.choice(pool)) for _ in range(n)))
            vecs = [_vec(rng) for _ in ids]
            st.upsert_vectors(vecs, ids=ids)
            for i, v in zip(ids, vecs):
                model[i] = tuple(v)
            if max_seen is not None:
                max_seen = max(max_seen, max(ids))
        elif op == "delete_ids":
            if not model:
                continue
            n = min(len(model), int(rng.integers(1, 4)))
            doomed = [int(i) for i in rng.choice(list(model), size=n, replace=False)]
            # include an id no file contains: must be a no-op for it
            removed = st.delete_vectors(ids=doomed + [10**9])
            assert removed == len(doomed)
            for i in doomed:
                del model[i]
        elif op == "clear":
            st.clear()
            model.clear()
            max_seen = None
        elif op == "optimize":
            if model:
                st.optimize(target_files=2, sort_by="id")
                max_seen = None  # optimize cold-starts the cache
        got = _store_contents(st)
        assert got == model, f"divergence at step {step} after {op!r}"

    # a fresh handle (new process analog) sees the same committed state
    st2 = cat.get_store("m", f"s{seed}")
    assert _store_contents(st2) == model
    # and vacuum never changes visible contents
    cat.vacuum(min_age_seconds=0)
    assert _store_contents(st2) == model
