#!/usr/bin/env python
"""Capture .explain("formatted") for every benchmarked query into
plans/r14/<query>_<tag>.txt, plus a one-line-per-query summary of the
plan shape (Exchange count, join strategies, Python-eval nodes,
scan PushedFilters presence).

Usage: python tools/plan_capture.py <tag>          # e.g. before / after
       python tools/plan_capture.py <tag> q1 q2 …  # subset
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mlx_vector_db_spark.queries import QUERIES, prewarm  # noqa: E402
from mlx_vector_db_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402  — the benchmarked set is the contract


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(txt: str) -> str:
    n_exch = len(re.findall(r"\bExchange\b", txt))
    joins = re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        txt,
    )
    py = re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|"
                    r"MapInArrow|FlatMapGroupsInPandas)\b", txt)
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", txt))
    wsc = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", txt)))
    from collections import Counter

    def cnt(xs):
        return ",".join(f"{k}x{v}" for k, v in sorted(Counter(xs).items())) or "-"

    return (
        f"exchanges={n_exch} joins=[{cnt(joins)}] py=[{cnt(py)}] "
        f"pushed_scans={pushed} codegen_spans={wsc}"
    )


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan_capture")
    try:
        prewarm(spark, sf_dir)  # ivf/funnel artifacts: plans resolve paths
    except Exception as exc:  # noqa: BLE001
        print(f"prewarm failed (plans may differ): {exc!r}")

    names = [n for n in bench.BENCH_QUERIES if not only or n in only]
    summaries = []
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            txt = plan_text(df)
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR: {exc!r}"
        (out_dir / f"{name}_{tag}.txt").write_text(txt)
        s = summarize(txt)
        summaries.append(f"{name}: {s}")
        print(f"{name}: {s}", flush=True)
    (out_dir / f"_summary_{tag}.txt").write_text("\n".join(summaries) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
