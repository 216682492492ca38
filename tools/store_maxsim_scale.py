#!/usr/bin/env python
"""Decade rows for the STORE-NATIVE late-interaction path (VERDICT r12
#8): `store.maxsim_query` end-to-end — manifest-resolved token scan,
saturation dispatch, funnel vs exact — at sf1/sf10 token scale, so the
store tier (not just the free operators) has measured growth.

Timed rows per shape:

- ``store_add_tokens``   — add_token_vectors ingest (pack + validate +
  duplicate probe + manifest commit)
- ``store_build_codes``  — build_token_codes (token-trained thresholds)
- ``store_exact``        — maxsim_query(funnel=False)
- ``store_funnel``       — maxsim_query(funnel=True) (forced two-pass)
- ``store_auto``         — maxsim_query() (saturation dispatch decides)

    SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
        python tools/store_maxsim_scale.py /tmp/sf1 --sf 1 --reps 3

Prints ONE JSON line in the BENCH sidecar format.
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
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--overfetch", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mlx_vector_db_spark.session import get_spark, release_intermediates
    from mlx_vector_db_spark.store import VectorStoreCatalog

    steal0 = _steal_jiffies()
    spark = get_spark("store-maxsim-scale")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    docs = emb.select(
        F.floor(F.col("vec_id") / F.lit(4)).cast("long").alias("doc_id"),
        "embedding",
    )
    n_tokens = docs.count()

    root = tempfile.mkdtemp(prefix="store-maxsim-scale-")
    cat = VectorStoreCatalog(spark, root)
    store = cat.create_store("scale", "tok", dimension=dim)

    t0 = time.monotonic()
    store.add_token_vectors(docs)
    add_s = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    store.build_token_codes(seed=42)
    build_s = round(time.monotonic() - t0, 2)

    qtok = spark.createDataFrame(
        docs.where(F.col("doc_id") < args.queries)
        .withColumnRenamed("doc_id", "query_id")
        .collect(),
        "query_id long, embedding array<float>",
    )

    timings = {
        "store_add_tokens": add_s,
        "store_build_codes": build_s,
    }
    spreads: dict[str, float] = {}
    for label, kw in (
        ("store_exact", {"funnel": False}),
        ("store_funnel", {"funnel": True, "overfetch": args.overfetch}),
        ("store_auto", {"overfetch": args.overfetch}),
    ):
        _noop(store.maxsim_query(qtok, k=args.k, **kw))  # warm
        release_intermediates(spark)
        reps = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            _noop(store.maxsim_query(qtok, k=args.k, **kw))
            reps.append(time.monotonic() - t0)
            release_intermediates(spark)
        timings[label] = round(_median(reps), 2)
        spreads[label] = round(max(reps) - min(reps), 2)

    n_docs = store.token_df().count()
    # r13: auto dispatch always runs the exact sweep (funnel is opt-in
    # after the cold A/B — see maxsim_query docstring)
    timings["store_auto_picked"] = "exact(default)"

    shutil.rmtree(root, ignore_errors=True)
    print(
        json.dumps(
            {
                "sf": args.sf if args.sf % 1 else int(args.sf),
                "reps": args.reps,
                "stat": "median",
                "queries": {
                    "n_doc_tokens": n_tokens,
                    "n_docs": n_docs,
                    "dim": dim,
                    "maxsim_n_queries": args.queries,
                    "maxsim_k": args.k,
                    "overfetch": args.overfetch,
                    **timings,
                },
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
