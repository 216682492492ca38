#!/usr/bin/env python
"""Decade rows for the retrieval composites born in r10: the Matryoshka
funnel (prefix-dim candidates + full-dim exact re-rank) and MMR
diversity rerank (knn pool + per-query greedy applyInPandas). Both ride
the rebalance-guarded exact kNN expression path, so these rows also
regression-pin that fix at every tier.

    SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
        python tools/retrieval_scale.py /tmp/sf1 --sf 1 --reps 3

Prints ONE JSON line in the BENCH_r*_sf* sidecar format.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _median(xs):
    xs = sorted(xs)
    mid = len(xs) // 2
    return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", type=int, default=100)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mlx_vector_db_spark.operators.mmr import mmr_search
    from mlx_vector_db_spark.operators.mrl import mrl_search_batch
    from mlx_vector_db_spark.session import get_spark, release_intermediates

    spark = get_spark("retrieval-scale")
    vec = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), "embedding"
    )
    n_rows = vec.count()
    queries = vec.where(F.col("id") < args.queries).select(
        F.col("id").alias("query_id"), "embedding"
    )
    timings: dict = {"n_rows": n_rows, "n_queries": args.queries}
    spreads: dict = {}

    def measure(name, build):
        _noop(build())  # warm
        release_intermediates(spark)
        reps = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            _noop(build())
            reps.append(time.monotonic() - t0)
            release_intermediates(spark)
        timings[name] = round(_median(reps), 2)
        spreads[name] = round(max(reps) - min(reps), 2)

    measure(
        "mrl_funnel",
        lambda: mrl_search_batch(vec, queries, d_prefix=8, k=10, overfetch=4),
    )
    measure(
        "mmr_search",
        lambda: mmr_search(vec, queries, k=10, fetch_k=40, lambda_=0.5),
    )

    print(
        json.dumps(
            {
                "sf": args.sf,
                "reps": args.reps,
                "stat": "median",
                "queries": timings,
                "spread": spreads,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
