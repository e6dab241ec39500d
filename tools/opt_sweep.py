#!/usr/bin/env python
"""One-pass structural sweep of the whole registry (r14 optimization).

Runs every registered query once (bench methodology: clear caches,
noop sink) in a single session with the UI store on, and records per
query: wall, the new stages' task counts, executor run/cpu time, and a
NARROW flag — any stage with <= 2 tasks and >= 0.4 CPU-s (a per-row
stage running serial on a 32-core box). Output: JSON to stdout-file.

Usage: python tools/opt_sweep.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "http://localhost:4047/api/v1/applications"


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opt_sweep.json"
    from tools.opt_probe import Probe

    p = Probe(extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4047"})
    app = json.load(urllib.request.urlopen(BASE))[0]["id"]

    def stages():
        return json.load(
            urllib.request.urlopen(f"{BASE}/{app}/stages?status=complete")
        )

    results = {}
    names = sorted(p.queries)
    for i, name in enumerate(names):
        before = {s["stageId"] for s in stages()}
        try:
            t0 = time.time()
            p.clear()
            p.queries[name](p.spark, p.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.time() - t0
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": str(e)[:200]}
            print(f"[{i + 1}/{len(names)}] {name}: ERROR {e}", flush=True)
            continue
        new = [s for s in stages() if s["stageId"] not in before]
        narrow = [
            {
                "stage": s["stageId"],
                "tasks": s["numCompleteTasks"],
                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                "run_s": round(s["executorRunTime"] / 1e3, 2),
            }
            for s in new
            if s["numCompleteTasks"] <= 2
            and s.get("executorCpuTime", 0) / 1e9 >= 0.4
        ]
        results[name] = {
            "wall_s": round(wall, 3),
            "n_stages": len(new),
            "sum_cpu_s": round(
                sum(s.get("executorCpuTime", 0) for s in new) / 1e9, 2
            ),
            "narrow": narrow,
        }
        flag = " NARROW" if narrow else ""
        print(
            f"[{i + 1}/{len(names)}] {name}: {wall:.2f}s"
            f" stages={len(new)}{flag}",
            flush=True,
        )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print("WROTE", out_path, flush=True)


if __name__ == "__main__":
    main()
