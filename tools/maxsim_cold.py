#!/usr/bin/env python
"""Cold-storage A/B for the MaxSim funnel (VERDICT r12 #3): the funnel's
remaining value claim is the 32x byte cut on COLD reads — warm-corpus
CPU loses to BLAS at dim 64 (SCALE.md r12) and the saturated regime
delegates away. Measure it instead of asserting it.

Method: build the packed float table and the sign-bit code table at the
target shape, then before every measured rep EVICT the artifact's page
cache with ``posix_fadvise(POSIX_FADV_DONTNEED)`` per file (no root
needed, per-inode eviction — the same pages a cold object-store read
would miss). Three measured modes per rep set:

- ``blocked_cold``  — exact blocked sweep, float table evicted first
- ``funnel_cold``   — two-pass funnel, BOTH artifacts evicted first
  (pass 1 reads the 32x-smaller codes; pass 2 re-reads only the
  candidates' float rows)
- ``blocked_warm`` / ``funnel_warm`` — same, no eviction (the SCALE.md
  r12 warm story, re-confirmed in the same process for a fair frame)

``--dim`` synthesizes a fresh uniform token corpus at that dimension
(dim 128 halves the bit kernel's relative cost vs dim 64 — the shape
the claim should win first if it wins anywhere).

    SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
        python tools/maxsim_cold.py /tmp/sf100knn --sf 100 --reps 3 \
        [--dim 128] [--queries 100]

Prints ONE JSON line in the BENCH sidecar format.
"""

from __future__ import annotations

import argparse
import json
import os
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


def _evict(*dirs: str) -> int:
    """posix_fadvise(DONTNEED) every byte of every parquet file under
    ``dirs`` — returns the number of bytes advised out."""
    total = 0
    for d in dirs:
        for f in Path(d).glob("**/*.parquet"):
            size = f.stat().st_size
            fd = os.open(f, os.O_RDONLY)
            try:
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
            finally:
                os.close(fd)
            total += size
    return total


def _du(d: str) -> int:
    return sum(f.stat().st_size for f in Path(d).glob("**/*.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--overfetch", type=int, default=8)
    ap.add_argument(
        "--dim",
        type=int,
        default=None,
        help="synthesize a uniform token corpus at this dim instead of "
        "reading sf_dir embeddings (keeps the same token count)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mlx_vector_db_spark.operators.bq import train_bq
    from mlx_vector_db_spark.operators.maxsim import (
        maxsim_funnel,
        maxsim_join,
        pack_doc_token_codes,
        pack_doc_tokens,
    )
    from mlx_vector_db_spark.session import get_spark, release_intermediates

    steal0 = _steal_jiffies()
    spark = get_spark("maxsim-cold")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    if args.dim:
        # same row count, synthetic uniform vectors at --dim (seeded by
        # vec_id so the corpus is deterministic across runs)
        dim = int(args.dim)
        emb = emb.select(
            "vec_id",
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: F.pmod(
                    F.hash(F.col("vec_id") * F.lit(2654435761) + i), F.lit(10_000)
                ).cast("float")
                / F.lit(10_000.0),
            ).alias("embedding"),
        )
    docs = emb.select(
        F.floor(F.col("vec_id") / F.lit(4)).cast("long").alias("doc_id"),
        "embedding",
    )
    n_tokens = docs.count()
    dim = len(docs.select("embedding").first()["embedding"])

    packed_path = tempfile.mkdtemp(prefix="maxsim-cold-pack-")
    pack_doc_tokens(docs).write.mode("overwrite").option(
        "parquet.block.size", 32 * 1024 * 1024
    ).parquet(packed_path)
    packed = spark.read.parquet(packed_path)
    bqm = train_bq(docs, seed=42)
    codes_path = tempfile.mkdtemp(prefix="maxsim-cold-codes-")
    pack_doc_token_codes(docs, bqm).write.mode("overwrite").option(
        "parquet.block.size", 32 * 1024 * 1024
    ).parquet(codes_path)
    codes = spark.read.parquet(codes_path)

    qtok = docs.where(F.col("doc_id") < args.queries).withColumnRenamed(
        "doc_id", "query_id"
    )
    qtok = spark.createDataFrame(
        qtok.collect(), "query_id long, embedding array<float>"
    )  # pin query tokens driver-side so reps never rescan the corpus for them

    def run_blocked():
        _noop(
            maxsim_join(
                packed, qtok, k=args.k, strategy="blocked",
                doc_tokens_packed=True,
            )
        )

    def run_funnel():
        _noop(
            maxsim_funnel(
                codes, packed, qtok, bqm, k=args.k,
                overfetch=args.overfetch, doc_tokens_packed=True,
                delegate_saturation=None,
            )
        )

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for label, fn, evict_dirs in (
        ("blocked_cold", run_blocked, (packed_path,)),
        ("funnel_cold", run_funnel, (packed_path, codes_path)),
        ("blocked_warm", run_blocked, ()),
        ("funnel_warm", run_funnel, ()),
    ):
        if not evict_dirs:
            fn()  # warm the cache for the warm rows
            release_intermediates(spark)
        reps = []
        for _ in range(args.reps):
            if evict_dirs:
                _evict(*evict_dirs)
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
                "queries": {
                    "n_doc_tokens": n_tokens,
                    "dim": dim,
                    "maxsim_n_queries": args.queries,
                    "maxsim_k": args.k,
                    "overfetch": args.overfetch,
                    **timings,
                },
                "bytes": {
                    "packed_float": _du(packed_path),
                    "codes": _du(codes_path),
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
