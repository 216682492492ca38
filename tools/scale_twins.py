#!/usr/bin/env python
"""Scale-tier measurement for the r8 rows-only twins with the
build-vs-search split VERDICT r8 demanded: the sweep-scale hints
(ivfpq_knn 46.6s, semdedup_embeddings 43.2s at sf0.01) are dominated
by one-time index/codebook construction, so a single end-to-end number
would fake the growth factor. This tool times the two phases
separately, the way the reference splits HNSW build from search
(reference performance/hnsw_index.py:79-129):

- ivfpq: BUILD = k-means + residual codebook training + coded-table
  materialization (once); SEARCH = the batch cell-pruned ADC +
  exact re-rank (median of --reps).
- semdedup: FIT = mini-batch k-means on the embeddings (once);
  DEDUP = assignment + per-cell BLAS gram + components + anti-join
  with the fitted model reused (median of --reps).
- hybrid_rrf: plain timed entry (no build phase), included so the
  lexical+vector fusion path finally has an sf10 row.

Prints ONE JSON line in the ``BENCH_r*_sf*_twins.json`` sidecar
format.

Usage::

    SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
        python tools/scale_twins.py /tmp/sf10 --sf 10 --reps 3
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    mid = len(xs) // 2
    return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    sf_dir = args.sf_dir.rstrip("/")

    from pyspark.sql import functions as F

    from mlx_vector_db_spark import queries as Q
    from mlx_vector_db_spark.session import get_spark, release_intermediates

    spark = get_spark("scale-twins")
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    errors: dict[str, str] = {}

    # page-cache warm pass over the one input table both twins read
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    # ---- ivfpq: build once (timed), search reps (timed) -------------
    try:
        t0 = time.monotonic()
        Q._ivfpq_artifact(spark, sf_dir)  # trains IVF + residual PQ, writes codes
        timings["ivfpq_build"] = round(time.monotonic() - t0, 2)
        _noop(Q.q_ivfpq_knn(spark, sf_dir))  # untimed: codegen/worker spin-up
        release_intermediates(spark)
        reps = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            _noop(Q.q_ivfpq_knn(spark, sf_dir))
            reps.append(time.monotonic() - t0)
        timings["ivfpq_search"] = round(_median(reps), 2)
        spreads["ivfpq_search"] = round(max(reps) - min(reps), 2)
    except Exception as exc:  # noqa: BLE001 — per-entry isolation
        errors["ivfpq"] = repr(exc)[:300]
    release_intermediates(spark)

    # ---- semdedup: fit once (timed), dedup reps with model reuse ----
    try:
        from mlx_vector_db_spark.operators.ann import auto_nlist
        from mlx_vector_db_spark.operators.clustering import kmeans_fit
        from mlx_vector_db_spark.operators.semdedup import semdedup

        emb = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id", "embedding")
        )
        n = emb.count()
        k = auto_nlist(n)
        t0 = time.monotonic()
        mdl = kmeans_fit(emb, k, seed=42)
        timings["semdedup_fit"] = round(time.monotonic() - t0, 2)
        timings["semdedup_k"] = k
        timings["semdedup_n"] = n

        def run():
            _noop(
                semdedup(emb, k=k, threshold=0.95, seed=42, model=mdl).agg(
                    F.count(F.lit(1)).cast("long").alias("n_survivors")
                )
            )

        run()  # untimed warm pass
        release_intermediates(spark)
        reps = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            run()
            reps.append(time.monotonic() - t0)
        timings["semdedup_dedup"] = round(_median(reps), 2)
        spreads["semdedup_dedup"] = round(max(reps) - min(reps), 2)
    except Exception as exc:  # noqa: BLE001
        errors["semdedup"] = repr(exc)[:300]
    release_intermediates(spark)

    # ---- hybrid_rrf: plain timed catalog entry ----------------------
    try:
        _noop(Q.QUERIES["hybrid_rrf"](spark, sf_dir))
        release_intermediates(spark)
        reps = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            _noop(Q.QUERIES["hybrid_rrf"](spark, sf_dir))
            reps.append(time.monotonic() - t0)
        timings["hybrid_rrf"] = round(_median(reps), 2)
        spreads["hybrid_rrf"] = round(max(reps) - min(reps), 2)
    except Exception as exc:  # noqa: BLE001
        errors["hybrid_rrf"] = repr(exc)[:300]

    out = {
        "sf": args.sf if args.sf % 1 else int(args.sf),
        "reps": args.reps,
        "stat": "median",
        "note": (
            "build/fit timed once (one-time persisted artifact), "
            "search/dedup median of reps with spread - see SCALE.md"
        ),
        "queries": timings,
        "spread": spreads,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
