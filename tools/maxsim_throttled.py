#!/usr/bin/env python
"""Bandwidth-throttled, byte-metered A/B for the MaxSim funnel — the
experiment that settles the tier's LAST unmeasured claim (SCALE.md r13:
"pass funnel=True when scan bandwidth, not CPU, is the bottleneck").

The NVMe cold A/B (tools/maxsim_cold.py) showed CPU dominating; this
tool emulates the bandwidth-bound regime directly:

- the measuring process (and the JVM it spawns — cgroup membership is
  inherited) joins a dedicated cgroup-v1 blkio cgroup with
  ``blkio.throttle.read_bps_device`` capped at ``--mbps`` (default 150,
  an object-store-per-node-like figure);
- before every rep the artifacts are evicted with posix_fadvise, so
  every parquet byte crosses the throttle;
- the cgroup's ``blkio.throttle.io_service_bytes`` taken before/after
  each rep gives the EXACT device bytes read — the byte claim is
  measured, not inferred from file sizes.

Why this matters: the funnel's pass 2 re-ranks via a semi-join against
the float token table — a full scan that the join filters AFTER decode
— so its device bytes are codes + ALL floats unless candidate pushdown
prunes the scan. This tool shows which story the bytes actually tell.

Must run as root (writes the blkio cgroup). Cleans the cgroup up on
exit; the throttle never applies outside the measuring process tree.

    SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
        python tools/maxsim_throttled.py /tmp/sf100knn --sf 100 \
        --reps 2 --mbps 150 [--queries 100]

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

CGROUP = Path("/sys/fs/cgroup/blkio/spark-graft-throttle")


def _device_of(path: str) -> str:
    st = os.stat(path)
    return f"{os.major(st.st_dev)}:{os.minor(st.st_dev)}"


def _join_cgroup(dev: str, bps: int) -> None:
    CGROUP.mkdir(exist_ok=True)
    (CGROUP / "blkio.throttle.read_bps_device").write_text(f"{dev} {bps}\n")
    (CGROUP / "cgroup.procs").write_text(str(os.getpid()))


def _read_bytes(dev: str) -> int:
    total = 0
    try:
        for line in (CGROUP / "blkio.throttle.io_service_bytes").read_text().splitlines():
            parts = line.split()
            if len(parts) == 3 and parts[0] == dev and parts[1] == "Read":
                total = int(parts[2])
    except OSError:
        pass
    return total


def _cleanup() -> None:
    try:
        Path("/sys/fs/cgroup/blkio/cgroup.procs").write_text(str(os.getpid()))
    except OSError:
        pass
    try:
        CGROUP.rmdir()
    except OSError:
        pass


def _evict(*dirs: str) -> None:
    for d in dirs:
        for f in Path(d).glob("**/*.parquet"):
            fd = os.open(f, os.O_RDONLY)
            try:
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
            finally:
                os.close(fd)


def _du(d: str) -> int:
    return sum(f.stat().st_size for f in Path(d).glob("**/*.parquet"))


def _median(xs):
    xs = sorted(xs)
    mid = len(xs) // 2
    return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--mbps", type=int, default=150)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--overfetch", type=int, default=8)
    args = ap.parse_args()

    dev = _device_of(args.sf_dir)
    _join_cgroup(dev, args.mbps * 1024 * 1024)
    import atexit

    atexit.register(_cleanup)

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
    spark = get_spark("maxsim-throttled")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    docs = emb.select(
        F.floor(F.col("vec_id") / F.lit(4)).cast("long").alias("doc_id"),
        "embedding",
    )
    n_tokens = docs.count()
    dim = len(docs.select("embedding").first()["embedding"])

    packed_path = tempfile.mkdtemp(prefix="maxsim-thr-pack-")
    pack_doc_tokens(docs).repartitionByRange(32, "doc_id").sortWithinPartitions("doc_id").write.mode("overwrite").option(
        "parquet.block.size", 32 * 1024 * 1024
    ).option("parquet.page.size", 64 * 1024).option(
        "parquet.page.row.count.limit", 100
    ).parquet(packed_path)
    packed = spark.read.parquet(packed_path)
    bqm = train_bq(docs, seed=42)
    codes_path = tempfile.mkdtemp(prefix="maxsim-thr-codes-")
    pack_doc_token_codes(docs, bqm).repartitionByRange(32, "doc_id").sortWithinPartitions("doc_id").write.mode("overwrite").option(
        "parquet.block.size", 32 * 1024 * 1024
    ).option("parquet.page.size", 64 * 1024).option(
        "parquet.page.row.count.limit", 100
    ).parquet(codes_path)
    codes = spark.read.parquet(codes_path)

    qtok = spark.createDataFrame(
        docs.where(F.col("doc_id") < args.queries)
        .withColumnRenamed("doc_id", "query_id")
        .collect(),
        "query_id long, embedding array<float>",
    )

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

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
    bytes_read: dict[str, int] = {}
    for label, fn in (("blocked_cold", run_blocked), ("funnel_cold", run_funnel)):
        reps = []
        byts = []
        for _ in range(args.reps):
            _evict(packed_path, codes_path)
            b0 = _read_bytes(dev)
            t0 = time.monotonic()
            fn()
            reps.append(time.monotonic() - t0)
            byts.append(_read_bytes(dev) - b0)
            release_intermediates(spark)
        timings[label] = round(_median(reps), 2)
        spreads[label] = round(max(reps) - min(reps), 2)
        bytes_read[label] = int(_median(byts))

    print(
        json.dumps(
            {
                "sf": args.sf if args.sf % 1 else int(args.sf),
                "reps": args.reps,
                "stat": "median",
                "throttle_read_mbps": args.mbps,
                "queries": {
                    "n_doc_tokens": n_tokens,
                    "dim": dim,
                    "maxsim_n_queries": args.queries,
                    "maxsim_k": args.k,
                    "overfetch": args.overfetch,
                    **timings,
                },
                "device_bytes_read": bytes_read,
                "artifact_bytes": {
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
