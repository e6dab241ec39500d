#!/usr/bin/env python
"""Stage + SQL-execution timeline for one registry query (r14 opt round).

The composite rows (release_gate family, record_linkage_incremental,
hybrid_rrf_serve) are bounded by JOB COUNT, not any one stage: each
eager construction job / checkpoint barrier is a driver round-trip.
This tool runs one query with the UI store on and prints the stage
timeline — submission gaps, per-stage wall/CPU/task-count — so the
serial fraction attributes to scheduling vs compute.

Usage: python tools/stage_timeline.py <query> [n_runs]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "http://localhost:4048/api/v1/applications"


def _ts(s: str) -> float:
    # REST timestamps look like 2026-08-17T12:34:56.789GMT
    return dt.datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from tools.opt_probe import Probe

    p = Probe(extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4048"})
    app = json.load(urllib.request.urlopen(BASE))[0]["id"]

    def stages():
        return json.load(
            urllib.request.urlopen(f"{BASE}/{app}/stages?status=complete")
        )

    def jobs():
        return json.load(urllib.request.urlopen(f"{BASE}/{app}/jobs"))

    wall = None
    for _ in range(n_runs):  # last (warm) run is the one reported
        before = {s["stageId"] for s in stages()}
        before_jobs = {j["jobId"] for j in jobs()}
        p.clear()
        t0 = time.time()
        p.queries[name](p.spark, p.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        print(f"{name}: wall {wall:.3f}s", flush=True)

    new = sorted(
        (s for s in stages() if s["stageId"] not in before),
        key=lambda s: s["submissionTime"],
    )
    new_jobs = sorted(
        (j for j in jobs() if j["jobId"] not in before_jobs),
        key=lambda j: j["submissionTime"],
    )
    job_of_stage = {}
    for j in new_jobs:
        for sid in j["stageIds"]:
            job_of_stage[sid] = j["jobId"]

    t_origin = _ts(new[0]["submissionTime"])
    prev_end = t_origin
    total_gap = 0.0
    print(f"\n{len(new)} stages, {len(new_jobs)} jobs; origin at 0.000")
    print(f"{'stage':>6} {'job':>4} {'start':>8} {'end':>8} {'gap':>6} "
          f"{'tasks':>5} {'cpu_s':>7} {'run_s':>7}  name")
    for s in new:
        st = _ts(s["submissionTime"]) - t_origin
        en = _ts(s["completionTime"]) - t_origin
        gap = max(0.0, (st + t_origin) - prev_end)
        total_gap += gap
        prev_end = max(prev_end, en + t_origin)
        print(
            f"{s['stageId']:>6} {job_of_stage.get(s['stageId'], -1):>4} "
            f"{st:8.3f} {en:8.3f} {gap:6.3f} {s['numCompleteTasks']:>5} "
            f"{s.get('executorCpuTime', 0) / 1e9:7.2f} "
            f"{s['executorRunTime'] / 1e3:7.2f}  {s['name'][:60]}"
        )
    span = prev_end - t_origin
    cpu = sum(s.get("executorCpuTime", 0) for s in new) / 1e9
    print(f"\nwall {wall:.3f}s  stage-span {span:.3f}s  "
          f"pre-span driver time {wall - span:.3f}s (approx)")
    print(f"sum gaps (no stage running) {total_gap:.3f}s  total cpu {cpu:.1f}s")


if __name__ == "__main__":
    main()
