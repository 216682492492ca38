#!/usr/bin/env python
"""Probe the batch_query saturation guard's m_probe bound (VERDICT r11
#8): the query-count probe is LIMIT-bounded at 65,536, so past 65k
queries the guard's saturation bound UNDERestimates M * take. The
docstring claims the conservative miss is cheap; this tool measures it
at the prescribed shape — M = 100k queries x N = 2M rows:

1. ``guard_decision``: what the store-level guard decides at this shape
   (with m_probe capped vs the true M) — at N = 2M both decide
   "saturated", i.e. the cap cannot flip the decision until
   N > 4 * 65,536 * take (~42M rows at k=10/BQ floor).
2. ``batch_query_guarded``: wall time of store.batch_query
   (use_quantized=True) — the guard fires, the plan is ONE exact sweep;
   the two LIMIT-bounded probes are the only overhead.
3. ``batch_query_exact``: use_quantized=False — the same sweep without
   the probes. guarded - exact = the measured guard overhead.

Needs a 2M-row embeddings dir (tools/make_sf100_emb.py output).

    SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
        python tools/saturation_boundary.py /tmp/sf100knn --queries 100000

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


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--queries", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument(
        "--no-warm",
        action="store_true",
        help="skip the untimed warm pass (one-shot boundary rows at the "
        "100k x 2M shape run ~8 min each; first-touch codegen is noise "
        "at that length)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mlx_vector_db_spark.session import get_spark, release_intermediates
    from mlx_vector_db_spark.store import VectorStoreCatalog

    steal0 = _steal_jiffies()
    spark = get_spark("saturation-boundary")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), "embedding"
    )
    n_rows = emb.count()

    # a real store with a BQ artifact, so the guard has a quantized
    # tier to (correctly) refuse
    root = tempfile.mkdtemp(prefix="sat-boundary-")
    cat = VectorStoreCatalog(spark, root)
    dim = len(emb.select("embedding").first()[0])
    st = cat.create_store("sat", "m", dimension=dim)
    t0 = time.monotonic()
    st.add_vectors(emb)
    st.build_bq()
    build_s = round(time.monotonic() - t0, 2)

    queries = (
        st.to_df()
        .where(F.col("id") < args.queries)
        .select(F.col("id").alias("query_id"), "embedding")
        .localCheckpoint(eager=False)
    )

    # the decision itself, capped vs true M (driver-side arithmetic on
    # the same constants batch_query uses)
    take_bq = args.k * 16
    m_capped = min(args.queries, 65_536)
    decision_capped = n_rows <= 4 * m_capped * take_bq
    decision_true = n_rows <= 4 * args.queries * take_bq

    timings: dict[str, float] = {
        "n_rows": n_rows,
        "n_queries": args.queries,
        "build_store_plus_bq": build_s,
    }

    def timed(label, fn):
        if not args.no_warm:
            fn()  # warm
            release_intermediates(spark)
        best = None
        for _ in range(args.reps):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
            release_intermediates(spark)
        timings[label] = round(best, 2)

    # blocked=False: knn_join's auto-dispatch picks the right blocked
    # strategy for a 100k-query batch (queries broadcast, vectors
    # streamed) — the production path batch_query delegates to
    timed(
        "batch_query_guarded",
        lambda: _noop(
            st.batch_query(queries, k=args.k, use_quantized=True)
        ),
    )
    timed(
        "batch_query_exact",
        lambda: _noop(
            st.batch_query(queries, k=args.k, use_quantized=False)
        ),
    )

    print(
        json.dumps(
            {
                "reps": args.reps,
                "stat": "min",
                "queries": timings,
                "guard": {
                    "m_probe_cap": 65_536,
                    "take_bq": take_bq,
                    "decision_with_cap_saturated": decision_capped,
                    "decision_true_saturated": decision_true,
                    "cap_flips_decision": decision_capped != decision_true,
                    "flip_needs_rows_gt": 4 * m_capped * take_bq,
                },
                "steal_cpu_sec": round(
                    (_steal_jiffies() - steal0) / _JIFFIES_HZ, 1
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
