#!/usr/bin/env python
"""Third-decade (sf100, 2M-row embeddings-only tier) rows for the twins
VERDICT r9 #4 and #7 left unmeasured:

- **semdedup** fit/dedup split with auto-k (auto_nlist(2M) cells) — the
  sf1->sf10 growth was measured sub-linear; this adds the 2M-row point.
- **batch kNN, fixed 10k-query batch vs 2M vectors**: at dim=64 the fp32
  matrix is 512 MB — ABOVE the 256 MB query-blocked budget — so auto
  dispatch must take the vector-blocked plan (broadcast the 10k queries,
  sweep the 2M-row table, O(batches*M*k) candidate shuffle). That is
  exactly the 100 TB shape, unmeasured past sf1. The row records which
  dispatch ran (asserted from the executed plan).
- **IVF-PQ with auto-nlist**: the r9 sf100 search row (2.84s) ran the
  catalog's fixed nlist=16; production sizing is auto_nlist(2M)=4096.
  Build once with nlist="auto", search at the SAME probed fraction as
  the catalog entry (nprobe = nlist/4 — on this uniform-on-sphere
  corpus recall tracks the probed fraction, so equal fraction is the
  recall-equivalent comparison; r8 measured finer cells at equal
  fraction WINNING wall at sf10).

Prints ONE JSON line in the BENCH_r10_sf100.json sidecar format.

Usage::

    SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
        python tools/r10_sf100.py /tmp/sf100knn --reps 3
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


class _Skip(Exception):
    """Section excluded by --only."""


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--knn-queries", type=int, default=10_000)
    ap.add_argument(
        "--only",
        default="knn,semdedup,ivfpq",
        help="comma list of sections to run (knn, semdedup, ivfpq) — "
        "re-measuring one weather-hit row must not pay the others",
    )
    args = ap.parse_args()
    sf_dir = args.sf_dir.rstrip("/")
    only = {s.strip() for s in args.only.split(",") if s.strip()}

    from pyspark.sql import functions as F

    from mlx_vector_db_spark.session import get_spark, release_intermediates

    spark = get_spark("r10-sf100")
    timings: dict[str, float | int | str] = {}
    spreads: dict[str, float] = {}
    errors: dict[str, str] = {}

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_rows = emb.count()  # page-cache warm + the tier's size of record
    timings["n_rows"] = n_rows

    # ---- batch kNN: 10k queries x 2M vectors, auto dispatch ----------
    try:
        if "knn" not in only:
            raise _Skip()
        from mlx_vector_db_spark.operators.knn import knn_join_blocked

        m = args.knn_queries
        queries = emb.where(F.col("vec_id") < m).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )

        def build():
            return knn_join_blocked(
                emb, queries, k=10, vec_col="embedding", id_col="vec_id"
            )

        plan = build()._jdf.queryExecution().executedPlan().toString()
        # name the dispatch the auto rule took (VERDICT r9 #4: at 512 MB
        # fp32 the budget gate must refuse the query-blocked collect)
        timings["knn_batch_dispatch"] = (
            "query-blocked" if "score_qblocks" in plan else "vector-blocked"
        )
        _noop(build())  # warm pass: worker spin-up, page cache
        release_intermediates(spark)
        reps = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            _noop(build())
            reps.append(time.monotonic() - t0)
            release_intermediates(spark)
        timings["knn_batch_10k_x_2m"] = round(_median(reps), 2)
        timings["knn_batch_qps"] = round(m / _median(reps), 1)
        spreads["knn_batch_10k_x_2m"] = round(max(reps) - min(reps), 2)
    except _Skip:
        pass
    except Exception as exc:  # noqa: BLE001 — per-entry isolation
        errors["knn_batch"] = repr(exc)[:300]
    release_intermediates(spark)

    # ---- semdedup: fit once (timed), dedup reps with model reuse -----
    try:
        if "semdedup" not in only:
            raise _Skip()
        from mlx_vector_db_spark.operators.ann import auto_nlist
        from mlx_vector_db_spark.operators.clustering import kmeans_fit
        from mlx_vector_db_spark.operators.semdedup import semdedup

        k = auto_nlist(n_rows)
        t0 = time.monotonic()
        mdl = kmeans_fit(emb, k, seed=42)
        timings["semdedup_fit"] = round(time.monotonic() - t0, 2)
        timings["semdedup_k"] = k

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
            release_intermediates(spark)
        timings["semdedup_dedup"] = round(_median(reps), 2)
        spreads["semdedup_dedup"] = round(max(reps) - min(reps), 2)
    except _Skip:
        pass
    except Exception as exc:  # noqa: BLE001
        errors["semdedup"] = repr(exc)[:300]
    release_intermediates(spark)

    # ---- IVF-PQ with auto-nlist (build once, search reps) ------------
    try:
        if "ivfpq" not in only:
            raise _Skip()
        from mlx_vector_db_spark.operators.ann import build_ivf
        from mlx_vector_db_spark.operators.pq import ivfpq_search_batch, train_pq

        t0 = time.monotonic()
        emb_id = emb.withColumnRenamed("vec_id", "id")
        indexed, ivf = build_ivf(emb_id, nlist="auto", seed=42)
        pq = train_pq(indexed, m=8, nbits=8, seed=42, centroids=ivf.centroids)
        import tempfile

        coded_path = tempfile.mkdtemp(prefix="ivfpq-auto-sf100-")
        pq.encode(indexed, centroids=ivf.centroids).write.mode(
            "overwrite"
        ).parquet(coded_path)
        timings["ivfpq_auto_build"] = round(time.monotonic() - t0, 2)
        nlist = len(ivf.centroids)
        timings["ivfpq_auto_nlist"] = nlist
        nprobe = max(1, nlist // 4)  # catalog entry's probed fraction
        timings["ivfpq_auto_nprobe"] = nprobe

        coded = spark.read.parquet(coded_path)
        queries = coded.where(F.col("id") < 100).select(
            F.col("id").alias("query_id"), "embedding"
        )

        def search():
            _noop(
                ivfpq_search_batch(
                    coded, queries, pq, ivf.centroids,
                    k=10, nprobe=nprobe, overfetch=4,
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
        timings["ivfpq_auto_search"] = round(_median(reps), 2)
        spreads["ivfpq_auto_search"] = round(max(reps) - min(reps), 2)
    except _Skip:
        pass
    except Exception as exc:  # noqa: BLE001
        errors["ivfpq_auto"] = repr(exc)[:300]

    out = {
        "sf": 100,
        "reps": args.reps,
        "stat": "median",
        "note": (
            "embeddings-only 2M-row tier; knn_batch is the auto-dispatch "
            "row (dispatch named), semdedup fit/dedup split, ivfpq with "
            "auto_nlist at the catalog's probed fraction - see SCALE.md"
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
