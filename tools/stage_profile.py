#!/usr/bin/env python
"""Per-stage runtime profile of catalog queries (guide §7.1 empirical
loop, headless): run each named query once warm + once profiled under a
job group, then pull per-stage metrics from the Spark UI REST API
(enabled on a private port for this session only).

Prints, per query: total profiled wall, and each stage's duration,
task count, input/shuffle bytes and the first line of its name — enough
to decide whether the time is scan, exchange, or compute, without the
browser UI.

Usage: python tools/stage_profile.py [--sf-dir D] [--reps N] q1 [q2 …]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mlx_vector_db_spark.queries import QUERIES, prewarm  # noqa: E402
from mlx_vector_db_spark.session import get_spark, release_intermediates  # noqa: E402

PORT = 4055


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:{PORT}/api/v1/{path}") as r:
        return json.load(r)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--no-prewarm", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark(
        "stage_profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(PORT),
            "spark.ui.retainedStages": "5000",
            "spark.ui.retainedJobs": "5000",
        },
    )
    if not args.no_prewarm:
        try:
            prewarm(spark, args.sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"prewarm failed: {exc!r}")
    app_id = spark.sparkContext.applicationId
    sc = spark.sparkContext

    for name in args.names:
        fn = QUERIES[name]
        # warm pass: codegen + page cache + python workers
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        release_intermediates(spark)
        sc.setJobGroup(f"prof:{name}", name)
        t0 = time.perf_counter()
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)

        jobs = [
            j
            for j in _api(f"applications/{app_id}/jobs")
            if j.get("jobGroup") == f"prof:{name}"
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        rows = []
        for sid in stage_ids:
            try:
                for att in _api(f"applications/{app_id}/stages/{sid}"):
                    rows.append(att)
            except Exception:  # noqa: BLE001 — skipped stages 404
                pass
        rows = [r for r in rows if r.get("status") != "SKIPPED"]
        rows.sort(key=lambda r: -(r.get("executorCpuTime") or 0))
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs, "
              f"{len(rows)} executed stages ===")
        for r in rows[:14]:
            nm = (r.get("name") or "").split("\n")[0][:80]
            print(
                f"  stage {r['stageId']:>4} cpu={r.get('executorCpuTime', 0)/1e9:6.2f}s "
                f"run={r.get('executorRunTime', 0)/1e3:6.2f}s "
                f"tasks={r.get('numCompleteTasks', 0):>3} "
                f"in={r.get('inputBytes', 0)/1e6:8.1f}MB "
                f"sr={r.get('shuffleReadBytes', 0)/1e6:7.1f}MB "
                f"sw={r.get('shuffleWriteBytes', 0)/1e6:7.1f}MB  {nm}"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
