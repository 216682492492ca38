#!/usr/bin/env python
"""Generate the embeddings-only sf100 tier (2M rows) used by the
third-decade scale rows (tools/r10_sf100.py, SCALE.md): the source
embeddings table verbatim as replica 0, then fresh unit-norm Gaussian
vectors (the make_sf_scale embeddings rule — the source corpus is
uniform-on-sphere, so fresh draws match the distribution without
creating fake cosine-0.99 twins). Label column replicated cyclically.

NEVER writes into /root/testdata — output goes to a scratch dir.

Usage::

    python tools/make_sf100_emb.py /root/testdata/sf0.1 /tmp/sf100knn 100
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> int:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    dst_p = Path(dst)
    if str(dst_p.resolve()).startswith("/root/testdata"):
        raise SystemExit("refusing to write into /root/testdata")
    dst_p.mkdir(parents=True, exist_ok=True)

    tbl = pq.read_table(f"{src}/embeddings.parquet")
    n0 = tbl.num_rows
    emb0 = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    labels0 = tbl.column("label").to_pylist()
    dim = emb0.shape[1]
    total = n0 * factor

    writer = None
    chunk = 100_000
    rng = np.random.default_rng(42)
    out_path = dst_p / "embeddings.parquet"
    start = 0
    while start < total:
        stop = min(start + chunk, total)
        ids = np.arange(start, stop, dtype=np.int64)
        if stop <= n0:
            X = emb0[start:stop]
        else:
            lo = max(start, n0)
            X = rng.standard_normal((stop - lo, dim)).astype(np.float32)
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            if start < n0:  # chunk straddles the verbatim/fresh boundary
                X = np.vstack([emb0[start:n0], X])
        labels = [labels0[i % n0] for i in range(start, stop)]
        flat = pa.array(X.reshape(-1), type=pa.float32())
        arr = pa.FixedSizeListArray.from_arrays(flat, dim).cast(
            pa.list_(pa.float32())
        )
        batch = pa.table(
            {"vec_id": pa.array(ids), "embedding": arr, "label": pa.array(labels)}
        )
        if writer is None:
            writer = pq.ParquetWriter(out_path, batch.schema)
        writer.write_table(batch)
        start = stop
    if writer is not None:
        writer.close()
    print(f"embeddings: {total} rows ({n0} verbatim + fresh) -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
