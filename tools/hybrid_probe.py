#!/usr/bin/env python
"""Adjudicate the hybrid_rrf in-session growth pathology (SCALE.md r10,
VERDICT r10 #7): serialized FRESH-PROCESS reps — each rep is its own
Python/JVM (no shared allocator, page cache the only carried state) —
with hypervisor-steal and /proc/meminfo brackets around every rep, so a
wild row adjudicates from the artifact alone:

- spread in-band + near-zero steal  -> quiet window, engine is fine
- spread wild + steal >> 0          -> host weather, named
- spread wild + steal ~ 0           -> reclaim theory: compare the
  MemAvailable/Dirty deltas across reps

Usage::

    SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
        python tools/hybrid_probe.py /tmp/sf10 --sf 10 --reps 5 \
        [--query hybrid_rrf]

Prints ONE JSON line (BENCH sidecar format) with per-rep walls, steal,
and meminfo deltas.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _JIFFIES_HZ, _steal_jiffies  # noqa: E402

_REP_SNIPPET = """
import sys, time
sys.path.insert(0, {repo!r})
from mlx_vector_db_spark.queries import QUERIES
from mlx_vector_db_spark.session import get_spark
spark = get_spark("hybrid-probe-rep")
t0 = time.monotonic()
QUERIES[{query!r}](spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
print("WALL", round(time.monotonic() - t0, 2))
"""


def _meminfo() -> dict[str, int]:
    out = {}
    try:
        for line in open("/proc/meminfo"):
            k, v = line.split(":", 1)
            if k in ("MemAvailable", "Dirty", "Cached", "SReclaimable"):
                out[k] = int(v.split()[0])  # kB
    except Exception:
        pass
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--query", default="hybrid_rrf")
    args = ap.parse_args()

    repo = str(Path(__file__).resolve().parent.parent)
    walls: list[float] = []
    steals: list[float] = []
    mem_deltas: list[dict[str, int]] = []
    for i in range(args.reps):
        m0, s0 = _meminfo(), _steal_jiffies()
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                _REP_SNIPPET.format(
                    repo=repo, query=args.query, sf_dir=args.sf_dir
                ),
            ],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        m1, s1 = _meminfo(), _steal_jiffies()
        wall = None
        for line in (proc.stdout or "").splitlines():
            if line.startswith("WALL "):
                wall = float(line.split()[1])
        if wall is None:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"rep {i} produced no WALL line")
        walls.append(wall)
        steals.append(round((s1 - s0) / _JIFFIES_HZ, 1))
        mem_deltas.append(
            {k: m1.get(k, 0) - m0.get(k, 0) for k in m0}
        )
        print(f"  rep {i}: {wall}s steal={steals[-1]}s", file=sys.stderr)

    srt = sorted(walls)
    mid = len(srt) // 2
    median = srt[mid] if len(srt) % 2 else (srt[mid - 1] + srt[mid]) / 2
    print(
        json.dumps(
            {
                "sf": args.sf if args.sf % 1 else int(args.sf),
                "reps": args.reps,
                "mode": "fresh-process serialized",
                "query": args.query,
                "walls": walls,
                "median": round(median, 2),
                "spread": round(max(walls) - min(walls), 2),
                "steal_cpu_sec_per_rep": steals,
                "meminfo_deltas_kb": mem_deltas,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
