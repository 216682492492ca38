#!/usr/bin/env python
"""Stage profile for dsir_weights at scale (VERDICT r12 #6): decompose
the pipeline into its three cost centers and time each as its own
materialization, so the sf1 wall (15.96s in the r12 window, the slowest
catalog entry there) is attributed rather than guessed:

- ``feats``  — explode(hashed_feature_buckets(text)): the md5 1-2-gram
  hashing map pass over the raw corpus (expected dominant — pure
  per-row CPU, no shuffle)
- ``qdist``  — feats -> groupBy(bucket) count: the bounded n_buckets
  aggregation (map-side combinable; the only shuffle carries <= 4096
  rows per partition combiner)
- ``full``   — the whole dsir_weights + top-50 entry as the catalog
  runs it

If feats ~= full, the time is the hash map pass (expected, linear,
record and move on). If full >> feats + qdist, something pathological
is in the join/aggregation tail.

    python tools/dsir_profile.py /tmp/sf1 --sf 1 --reps 3

Prints ONE JSON line in the BENCH sidecar format.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _JIFFIES_HZ, _steal_jiffies  # noqa: E402


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
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mlx_vector_db_spark.operators.quality import hashed_feature_buckets
    from mlx_vector_db_spark.queries import QUERIES
    from mlx_vector_db_spark.session import get_spark, release_intermediates

    steal0 = _steal_jiffies()
    spark = get_spark("dsir-profile")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    n_docs = docs.count()  # warm the page cache

    feats = docs.select(
        "doc_id",
        F.explode(hashed_feature_buckets("text", 4096, 2)).alias("bucket"),
    )

    def run_feats():
        _noop(feats)

    def run_qdist():
        _noop(feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("q_c")))

    def run_full():
        _noop(QUERIES["dsir_weights"](spark, args.sf_dir))

    timings = {}
    spreads = {}
    for label, fn in (("feats", run_feats), ("qdist", run_qdist), ("full", run_full)):
        fn()  # warm
        release_intermediates(spark)
        reps = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            fn()
            reps.append(time.monotonic() - t0)
            release_intermediates(spark)
        timings[label] = round(_median(reps), 2)
        spreads[label] = round(max(reps) - min(reps), 2)

    print(
        json.dumps(
            {
                "sf": args.sf if args.sf % 1 else int(args.sf),
                "reps": args.reps,
                "stat": "median",
                "queries": {"n_docs": n_docs, **timings},
                "spread": spreads,
                "steal_cpu_sec": round(
                    (_steal_jiffies() - steal0) / _JIFFIES_HZ, 1
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
