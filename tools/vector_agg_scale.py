#!/usr/bin/env python
"""Decade rows for the two r11 vector-analytics entries (VERDICT r11
#5): grouped kNN (top-k per (query, label)) and per-label centroids.

Two measurement modes in one JSON line:

1. CATALOG shape at a real corpus dir (``sf_dir``): the registry
   entries ``knn_grouped_topk`` / ``label_centroids`` exactly as the
   driver runs them (10 labels, dim 64) — real-corpus growth.
2. HIGH-CARDINALITY synthetic shape (``--hc-vecs`` > 0): dim
   ``--hc-dim`` (default 768) x ``--hc-labels`` (default 10k) labels —
   the regime the verdict asked about: does ONE WindowGroupLimit still
   cut before the sort when labels x queries is large, and what does
   the labels x dim centroid shuffle cost at dim 768? The corpus is
   generated distributed (seeded per-row mapInPandas) and persisted,
   so the timed queries measure scan -> aggregate, not generation.

    SPARK_GRAFT_SHUFFLE_PARTITIONS=256 python tools/vector_agg_scale.py \
        /tmp/sf1 --sf 1 --reps 3 --hc-vecs 100000

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


def _timed(fn, reps, spark):
    from mlx_vector_db_spark.session import release_intermediates

    fn()  # warm (codegen + page cache)
    release_intermediates(spark)
    out = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        out.append(time.monotonic() - t0)
        release_intermediates(spark)
    return round(_median(out), 2), round(max(out) - min(out), 2)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--hc-vecs", type=int, default=0)
    ap.add_argument("--hc-dim", type=int, default=768)
    ap.add_argument("--hc-labels", type=int, default=10_000)
    ap.add_argument("--hc-queries", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mlx_vector_db_spark.queries import QUERIES
    from mlx_vector_db_spark.session import get_spark

    steal0 = _steal_jiffies()
    spark = get_spark("vector-agg-scale")
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}

    # mode 1: the catalog entries on the real corpus
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    timings["n_vectors"] = emb.count()
    for name in ("knn_grouped_topk", "label_centroids"):
        med, spr = _timed(
            lambda: _noop(QUERIES[name](spark, args.sf_dir)), args.reps, spark
        )
        timings[name] = med
        spreads[name] = spr

    # mode 2: high-cardinality synthetic shape
    if args.hc_vecs:
        import numpy as np

        dim, n_labels = args.hc_dim, args.hc_labels

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                ids = pdf["id"].to_numpy()
                vecs = [
                    np.random.default_rng(int(i) + 4_000_037)
                    .standard_normal(dim)
                    .astype(np.float32)
                    for i in ids
                ]
                yield pd.DataFrame(
                    {
                        "vec_id": ids,
                        "label": ids % n_labels,
                        "embedding": vecs,
                    }
                )

        base = spark.range(args.hc_vecs).repartition(
            spark.sparkContext.defaultParallelism
        )
        hc_path = tempfile.mkdtemp(prefix="vec-agg-hc-")
        base.mapInPandas(
            gen, schema="vec_id long, label long, embedding array<float>"
        ).write.mode("overwrite").parquet(hc_path)
        hc = spark.read.parquet(hc_path)
        timings["hc_shape"] = {
            "vecs": args.hc_vecs,
            "dim": dim,
            "labels": n_labels,
            "queries": args.hc_queries,
        }

        from mlx_vector_db_spark.functions.vector import score_for_metric
        from mlx_vector_db_spark.operators.topk import top_k_per_group
        from mlx_vector_db_spark.rebalance import rebalance_for_compute

        def grouped_knn():
            qdf = F.broadcast(
                hc.where(F.col("vec_id") < args.hc_queries).select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").cast("array<double>").alias("_qvec"),
                )
            )
            src = rebalance_for_compute(
                hc.select("vec_id", "label", "embedding")
            )
            scored = src.crossJoin(qdf).select(
                "query_id",
                "label",
                "vec_id",
                score_for_metric("cosine", "embedding", F.col("_qvec")).alias(
                    "s"
                ),
            )
            _noop(
                top_k_per_group(
                    scored,
                    ["query_id", "label"],
                    [F.col("s").desc(), F.col("vec_id").asc()],
                    3,
                )
            )

        def centroids():
            per_dim = (
                hc.select(
                    "label", F.posexplode("embedding").alias("pos", "val")
                )
                .groupBy("label", "pos")
                .agg(F.avg("val").alias("m"), F.count(F.lit(1)).alias("n"))
            )
            _noop(
                per_dim.groupBy("label").agg(
                    F.first("n").alias("n_vectors"),
                    F.sort_array(
                        F.collect_list(F.struct("pos", "m"))
                    ).alias("pairs"),
                )
            )

        med, spr = _timed(grouped_knn, args.reps, spark)
        timings["hc_grouped_knn"] = med
        spreads["hc_grouped_knn"] = spr
        med, spr = _timed(centroids, args.reps, spark)
        timings["hc_label_centroids"] = med
        spreads["hc_label_centroids"] = spr

    print(
        json.dumps(
            {
                "sf": args.sf if args.sf % 1 else int(args.sf),
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
