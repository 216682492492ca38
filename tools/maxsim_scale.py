#!/usr/bin/env python
"""Decade-scale rows for the late-interaction (MaxSim) operator: docs =
the embeddings table packed 4 consecutive vec_ids per doc, queries =
the first ``--queries`` groups of 4 token vectors. Times the packing
(build — one groupBy shuffle, amortizable by storing packed) and the
blocked sweep (search) separately, the scale_twins discipline; the
expression strategy is timed too when ``--expression`` is given (small
tiers only — it is the <=256-token path by design).

    SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
        python tools/maxsim_scale.py /tmp/sf100knn --sf 100 --reps 3

Prints ONE JSON line in the BENCH sidecar format.
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--expression", action="store_true")
    ap.add_argument(
        "--funnel",
        action="store_true",
        help="also build sign-bit token codes and time the PLAID-shaped "
        "Hamming funnel (build + search split)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mlx_vector_db_spark.operators.maxsim import (
        maxsim_join,
        pack_doc_tokens,
    )
    from mlx_vector_db_spark.session import get_spark, release_intermediates

    steal0 = _steal_jiffies()
    spark = get_spark("maxsim-scale")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    docs = emb.select(
        F.floor(F.col("vec_id") / F.lit(4)).cast("long").alias("doc_id"),
        "embedding",
    )
    n_tokens = docs.count()  # page-cache warm

    # build: pack tokens per doc, persist — the layout a 100 TB corpus
    # stores once and sweeps many times
    t0 = time.monotonic()
    packed_path = tempfile.mkdtemp(prefix="maxsim-scale-")
    pack_doc_tokens(docs).write.mode("overwrite").parquet(packed_path)
    build_s = round(time.monotonic() - t0, 2)
    packed = spark.read.parquet(packed_path)

    qtok = emb.where(F.col("vec_id") < 4 * args.queries).select(
        F.floor(F.col("vec_id") / F.lit(4)).cast("long").alias("query_id"),
        "embedding",
    )

    def run(strategy, doc_side, pre_packed):
        _noop(
            maxsim_join(
                doc_side, qtok, k=args.k, strategy=strategy,
                doc_tokens_packed=pre_packed,
            )
        )

    timings = {}
    spreads = {}
    for label, strategy, doc_side, pre in (
        ("maxsim_blocked", "blocked", packed, True),
        *(
            [("maxsim_expression", "expression", docs, False)]
            if args.expression
            else []
        ),
    ):
        run(strategy, doc_side, pre)  # warm
        release_intermediates(spark)
        reps = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            run(strategy, doc_side, pre)
            reps.append(time.monotonic() - t0)
            release_intermediates(spark)
        timings[label] = round(_median(reps), 2)
        spreads[label] = round(max(reps) - min(reps), 2)

    if args.funnel:
        from mlx_vector_db_spark.operators.bq import train_bq
        from mlx_vector_db_spark.operators.maxsim import (
            maxsim_funnel,
            pack_doc_token_codes,
        )

        t0 = time.monotonic()
        bqm = train_bq(docs, seed=42)
        codes_path = tempfile.mkdtemp(prefix="maxsim-codes-")
        pack_doc_token_codes(docs, bqm).write.mode("overwrite").parquet(
            codes_path
        )
        timings["maxsim_funnel_build"] = round(time.monotonic() - t0, 2)
        codes = spark.read.parquet(codes_path)

        def run_funnel():
            _noop(
                maxsim_funnel(
                    codes, docs, qtok, bqm, k=args.k, overfetch=8
                )
            )

        run_funnel()
        release_intermediates(spark)
        reps = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            run_funnel()
            reps.append(time.monotonic() - t0)
            release_intermediates(spark)
        timings["maxsim_funnel"] = round(_median(reps), 2)
        spreads["maxsim_funnel"] = round(max(reps) - min(reps), 2)

    print(
        json.dumps(
            {
                "sf": args.sf if args.sf % 1 else int(args.sf),
                "reps": args.reps,
                "stat": "median",
                "queries": {
                    "n_doc_tokens": n_tokens,
                    "maxsim_pack_build": build_s,
                    **timings,
                    "maxsim_n_queries": args.queries,
                    "maxsim_k": args.k,
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
