#!/usr/bin/env python
"""Scale rows for the binary-quantization tier (build/search split, the
scale_twins discipline): train per-dim thresholds + encode the corpus
once (timed — the build), then Hamming-scan + exact-rerank search reps
over the persisted coded table. Run at any embeddings tier, e.g. the
2M-row sf100 dir from tools/make_sf100_emb.py:

    SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
        python tools/bq_scale.py /tmp/sf100knn --sf 100 --reps 3

Prints ONE JSON line in the BENCH_r*_sf* sidecar format.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
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
    ap.add_argument("--overfetch", type=int, default=16)
    ap.add_argument(
        "--pin-bq",
        action="store_true",
        help="delegate_saturation=None: measure the Hamming two-pass tier "
        "itself even where the production default would saturation-"
        "delegate to the exact sweep",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mlx_vector_db_spark.operators.bq import bq_search_batch, train_bq
    from mlx_vector_db_spark.session import get_spark, release_intermediates

    from bench import _JIFFIES_HZ, _steal_jiffies

    steal0 = _steal_jiffies()
    spark = get_spark("bq-scale")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), "embedding"
    )
    n_rows = emb.count()  # page-cache warm + size of record

    t0 = time.monotonic()
    bq = train_bq(emb, seed=42)
    coded_path = tempfile.mkdtemp(prefix="bq-scale-")
    bq.encode(emb).write.mode("overwrite").parquet(coded_path)
    build_s = round(time.monotonic() - t0, 2)

    coded = spark.read.parquet(coded_path)
    queries = coded.where(F.col("id") < args.queries).select(
        F.col("id").alias("query_id"), "embedding"
    )

    def search():
        _noop(
            bq_search_batch(
                coded, queries, bq, k=10, overfetch=args.overfetch,
                delegate_saturation=None if args.pin_bq else 0.25,
            )
        )

    search()  # warm
    release_intermediates(spark)
    reps = []
    for _ in range(args.reps):
        t0 = time.monotonic()
        search()
        reps.append(time.monotonic() - t0)
        release_intermediates(spark)

    print(
        json.dumps(
            {
                "sf": args.sf,
                "reps": args.reps,
                "stat": "median",
                "queries": {
                    "n_rows": n_rows,
                    "bq_build": build_s,
                    "bq_search": round(_median(reps), 2),
                    "bq_overfetch": args.overfetch,
                    "bq_n_queries": args.queries,
                    "bq_pinned": bool(args.pin_bq),
                },
                "spread": {"bq_search": round(max(reps) - min(reps), 2)},
                "steal_cpu_sec": round(
                    (_steal_jiffies() - steal0) / _JIFFIES_HZ, 1
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
