#!/usr/bin/env python
"""Indexed-vs-scan ANN checkpoint: at an arbitrary sf directory, build
the IVF index ONCE (off-clock, like any persisted index), then time the
same batch of queries through (a) the exact full-scan kNN path and
(b) the probe-pruned IVF path reading a centroid-partitioned layout,
and report wall ratio + recall@k of (b) against (a)'s ground truth.

This is the scale evidence the uniform-bench subset can't show: the
exact scan grows linearly with the table, the probed path grows with
nprobe/nlist of the table. At sf100 (2M x 64-dim) the pruned scan reads
only the probed directories (PartitionFilters — same plan shape
test_plans.py pins at sf0.01).

Usage::

    SPARK_GRAFT_DRIVER_MEM=48g python tools/ann_scale_compare.py \
        /tmp/sf100 --sf 100 --nlist 64 --nprobe 4 --queries 32
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--nlist", type=int, default=64)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from mlx_vector_db_spark.operators.ann import build_ivf
    from mlx_vector_db_spark.operators.knn import knn_join
    from mlx_vector_db_spark.session import get_spark, release_intermediates

    spark = get_spark("ann-scale-compare")
    emb = (
        spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
        .withColumnRenamed("vec_id", "id")
        .select("id", "embedding")
    )
    n_vectors = emb.count()

    # --- build (once, off the comparison clock, like every persisted
    # index artifact in the catalog) ---
    t0 = time.monotonic()
    indexed, index = build_ivf(emb, nlist=args.nlist, seed=42, max_iter=8)
    staged = tempfile.mkdtemp(prefix="ann-scale-ivf-")
    (
        indexed.repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(staged)
    )
    build_s = round(time.monotonic() - t0, 2)
    table = spark.read.parquet(staged)

    queries = (
        emb.where(F.col("id") < args.queries)
        .select(F.col("id").alias("query_id"), "embedding")
        .persist()
    )
    queries.count()

    def timed(make_df):
        best = float("inf")
        rows = None
        make_df().collect()  # warmup pays codegen off-clock
        for _ in range(args.reps):
            t0 = time.monotonic()
            rows = make_df().collect()
            best = min(best, time.monotonic() - t0)
            release_intermediates(spark)
        return best, rows

    # --- exact full-scan baseline (ground truth) ---
    exact_s, exact_rows = timed(
        lambda: knn_join(emb, queries, k=args.k, metric="cosine")
    )
    truth: dict[int, set] = {}
    for r in exact_rows:
        truth.setdefault(int(r["query_id"]), set()).add(int(r["id"]))

    # --- probe-pruned indexed path over the partitioned layout ---
    idx_s, idx_rows = timed(
        lambda: index.search_batch(
            table, queries, k=args.k, nprobe=args.nprobe
        )
    )
    hits = sum(
        1
        for r in idx_rows
        if int(r["id"]) in truth.get(int(r["query_id"]), set())
    )
    recall = round(hits / max(1, sum(len(s) for s in truth.values())), 4)

    queries.unpersist()
    shutil.rmtree(staged, ignore_errors=True)
    out = {
        "sf": args.sf if args.sf % 1 else int(args.sf),
        "n_vectors": n_vectors,
        "nlist": args.nlist,
        "nprobe": args.nprobe,
        "k": args.k,
        "n_queries": args.queries,
        "build_s": build_s,
        "exact_scan_s": round(exact_s, 2),
        "indexed_s": round(idx_s, 2),
        "speedup": round(exact_s / idx_s, 2) if idx_s else None,
        "recall_at_k": recall,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
