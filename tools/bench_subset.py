#!/usr/bin/env python
"""Targeted scale-checkpoint bench: run a named subset of the catalog at
an arbitrary sf directory and print one JSON line in the
``BENCH_r*_sf*_subset.json`` sidecar format.

Unlike bench.py (the official per-round artifact at sf0.1, median of
3), scale checkpoints at sf10/sf100 time the LINEAR-path operators only
— the uncapped Jaccard audit tier and the O(N²)-by-construction
all-vs-all batch benchmark are excluded by design — and use few reps
(the point is growth ORDER across decades, not microsecond stability).

Usage::

    SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
        python tools/bench_subset.py /tmp/sf100 --sf 100 --reps 1 [name ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_SUBSET = [
    "pricing_summary",
    "events_hourly",
    "top_orders",
    "knn_cosine_topk",
    "dedup_exact",
    "minhash_neardup_pairs",
    "text_jaccard_capped",
    "curation_pipeline",
    "ngram_contamination",
    "doc_repetition",
    "doc_perplexity",
    "bm25_topk",
    "chunk_documents",
    # r7: the distribution-derived fan-out-budget auto-cap bounds both
    # entries at O(n_docs) candidate pairs by construction, so the
    # former sf10 exclusions (r6 heap exhaustion on the replica-family
    # corpus) are back in the measured subset
    "text_jaccard_autocap",
    "winnow_crossdoc_pairs",
    "bpe_pair_counts",
    "vocab_coverage",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--stat", choices=["min", "median"], default="min")
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()
    names = args.names or DEFAULT_SUBSET

    from mlx_vector_db_spark.queries import QUERIES
    from mlx_vector_db_spark.session import get_spark, release_intermediates

    from bench import _JIFFIES_HZ, _steal_jiffies

    steal0 = _steal_jiffies()
    spark = get_spark("bench-subset")
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        try:
            # one untimed pass pays codegen/worker spin-up off-clock
            QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            reps: list[float] = []
            for _ in range(args.reps):
                t0 = time.monotonic()
                QUERIES[name](spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                reps.append(time.monotonic() - t0)
            reps.sort()
            if args.stat == "median":
                mid = len(reps) // 2
                val = reps[mid] if len(reps) % 2 else (reps[mid - 1] + reps[mid]) / 2
            else:
                val = reps[0]
            timings[name] = round(val, 2)
        except Exception as exc:  # noqa: BLE001 — per-query isolation
            errors[name] = repr(exc)[:300]
            timings[name] = -1.0
        release_intermediates(spark)
        print(f"  {name}: {timings[name]}", file=sys.stderr)
    out = {
        "sf": args.sf if args.sf % 1 else int(args.sf),
        "reps": args.reps,
        "stat": args.stat,
        "note": (
            "targeted linear-path subset; uncapped/audit tiers and the "
            "O(N^2)-by-construction all-vs-all batch benchmark excluded "
            "by design - see SCALE.md"
        ),
        "queries": timings,
        "steal_cpu_sec": round((_steal_jiffies() - steal0) / _JIFFIES_HZ, 1),
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
