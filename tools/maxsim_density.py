#!/usr/bin/env python
"""Heavy-token-density decade rows for the blocked MaxSim sweep
(VERDICT r11 #1 "done" criterion): the catalog and maxsim_scale shapes
use 4 tokens/doc, so the cumulative-token chunking never binds there;
this tool measures the ColBERT-realistic regime — default 10k docs x
128 tokens/doc x 64D, 100 queries x 32 tokens — where a single Arrow
batch holds ~1.3M tokens and the doc axis MUST split on token count to
keep the flattened fp64 token matrix under the 64 MB element budget.

The corpus is generated distributed (seeded per-doc mapInPandas, no
driver materialization) directly in the packed layout and persisted to
parquet, so the timed sweep measures search over stored packed docs —
the 100 TB serving shape. ``--funnel`` also builds sign-bit codes and
times the PLAID-shaped funnel at the same density.

    python tools/maxsim_density.py --docs 10000 --tokens 128 --dim 64 \
        --queries 100 --qtokens 32 --reps 3

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
    ap.add_argument("--docs", type=int, default=10_000)
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--qtokens", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--funnel", action="store_true")
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from mlx_vector_db_spark.operators.maxsim import maxsim_join
    from mlx_vector_db_spark.session import get_spark, release_intermediates

    steal0 = _steal_jiffies()
    spark = get_spark("maxsim-density")
    dim, tpd = args.dim, args.tokens

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            vecs = []
            for d in ids:
                r = np.random.default_rng(int(d) + 13_000_017)
                vecs.append(
                    [t for t in r.standard_normal((tpd, dim)).astype(np.float32)]
                )
            yield pd.DataFrame({"doc_id": ids, "token_vecs": vecs})

    # generate PACKED directly (the storage layout): zero shuffles, one
    # map-only pass, persisted once — build cost reported separately
    base = spark.range(args.docs).select(F.col("id").alias("doc_id"))
    base = base.repartition(spark.sparkContext.defaultParallelism)
    t0 = time.monotonic()
    packed_path = tempfile.mkdtemp(prefix="maxsim-density-")
    # 32 MB row groups (store._TOKEN_PARQUET_BLOCK rationale): packed
    # rows are ~32 KB, and a default 128 MB row group decodes into one
    # ~134 MB vectorized-reader batch per task — OOMs small heaps
    base.mapInPandas(
        gen, schema="doc_id long, token_vecs array<array<float>>"
    ).write.mode("overwrite").option(
        "parquet.block.size", 32 * 1024 * 1024
    ).parquet(packed_path)
    build_s = round(time.monotonic() - t0, 2)
    packed = spark.read.parquet(packed_path)
    n_tokens = args.docs * tpd

    rq = np.random.default_rng(99)
    qrows = [
        (q, rq.standard_normal(dim).astype(np.float32).tolist())
        for q in range(args.queries)
        for _ in range(args.qtokens)
    ]
    qtok = spark.createDataFrame(
        qrows, "query_id long, embedding array<float>"
    )

    timings = {"maxsim_pack_build": build_s, "n_doc_tokens": n_tokens}
    spreads = {}

    def run_blocked():
        _noop(
            maxsim_join(
                packed, qtok, k=args.k, strategy="blocked",
                doc_tokens_packed=True,
            )
        )

    run_blocked()  # warm
    release_intermediates(spark)
    reps = []
    for _ in range(args.reps):
        t0 = time.monotonic()
        run_blocked()
        reps.append(time.monotonic() - t0)
        release_intermediates(spark)
    timings["maxsim_blocked"] = round(_median(reps), 2)
    spreads["maxsim_blocked"] = round(max(reps) - min(reps), 2)

    if args.funnel:
        from mlx_vector_db_spark.operators.bq import train_bq
        from mlx_vector_db_spark.operators.maxsim import (
            maxsim_funnel,
            pack_doc_token_codes,
        )

        flat = packed.select(
            "doc_id", F.explode("token_vecs").alias("embedding")
        )
        t0 = time.monotonic()
        bqm = train_bq(flat, seed=42)
        codes_path = tempfile.mkdtemp(prefix="maxsim-density-codes-")
        pack_doc_token_codes(flat, bqm).write.mode("overwrite").parquet(
            codes_path
        )
        timings["maxsim_funnel_build"] = round(time.monotonic() - t0, 2)
        codes = spark.read.parquet(codes_path)

        def run_funnel(sat):
            _noop(
                maxsim_funnel(
                    codes, packed, qtok, bqm, k=args.k, overfetch=8,
                    doc_tokens_packed=True, delegate_saturation=sat,
                )
            )

        # pinned two-pass plan vs the production default (which
        # saturation-delegates to one exact sweep past M*take >= 0.25*N
        # — the r12 rule this shape motivated)
        for label, sat in (
            ("maxsim_funnel_pinned", None),
            ("maxsim_funnel_default", 0.25),
        ):
            run_funnel(sat)
            release_intermediates(spark)
            reps = []
            for _ in range(args.reps):
                t0 = time.monotonic()
                run_funnel(sat)
                reps.append(time.monotonic() - t0)
                release_intermediates(spark)
            timings[label] = round(_median(reps), 2)
            spreads[label] = round(max(reps) - min(reps), 2)

    print(
        json.dumps(
            {
                "shape": {
                    "docs": args.docs,
                    "tokens_per_doc": tpd,
                    "dim": dim,
                    "queries": args.queries,
                    "qtokens": args.qtokens,
                    "k": args.k,
                },
                "reps": args.reps,
                "stat": "median",
                "queries": timings,
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
