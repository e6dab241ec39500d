#!/usr/bin/env python
"""Identical-code host A/B: re-run a PINNED engine commit on THIS host
and compare per-query walls against that commit's own committed bench
record — the one-command form of the by-hand A/B that justified the
late-r13 host-class re-pins (r13 verdict next-#5: the evidence lived
only as SCALE.md prose; future pin changes require this tool's output).

What it measures: per-query ratio rerun/committed for the SAME code.
A ratio distribution centered well above 1.0 with healthy probes means
the HOST class moved, not the engine — the r13 finding (r11 engine
e9fa999 re-run: s/q 1.947 vs committed 1.239, median per-query 1.341,
p25 1.197). A distribution near 1.0 means the host matches the record's
class and TARGETS.json's strict pins should be in force (bench.py's
_strict_if evaluates that automatically per record).

Protocol (documented so future runs compare like with like): the pinned
commit is checked out into a cached git worktree; every selected query
runs ONCE untimed in registry order (fixture staging + JIT, the
bench.py prestage analog), then each is timed min-of-2 with the cache/
checkpoint clearing bench.py uses. Single-thread + 32-way probes run at
both ends so the A/B carries its own box-health evidence.

Usage:
  python tools/host_ab.py <commit> [--top N] [--names a,b,c]
                          [--sf-dir DIR] [--cpus N]
Writes HOST_AB_<shortsha>.json at the repo root and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

_RUNNER = r'''
import json, os, sys, time

worktree, sf_dir, cpus, out_path, names_json = sys.argv[1:6]
names = json.loads(names_json)
os.environ.setdefault("DATABUS_CACHE_CHANGELOGS", "1")
sys.path.insert(0, worktree)
os.chdir(worktree)

from databus_spark.session import build_session

spark = build_session("host_ab", cpus=int(cpus))
import __spark_entry__ as entry_mod

queries = entry_mod.queries()


def clear_caches():
    spark.catalog.clearCache()
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd in list(jmap.values()):
            rdd.unpersist(True)
        spark._jvm.System.gc()
    except Exception:
        pass


# JIT / Arrow-worker warm-up (bench.py's untimed prelude)
spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").write.format(
    "noop"
).mode("overwrite").save()

# one untimed pass stages every fixture the selection touches
for name in names:
    try:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception as e:
        print("PRESTAGE FAIL", name, e, file=sys.stderr)

timings = {}
for name in names:
    best = float("inf")
    for _ in range(2):
        clear_caches()
        t0 = time.time()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    timings[name] = round(best, 3)

with open(out_path, "w") as f:
    json.dump(timings, f)
spark.stop()
'''


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=ROOT, check=True, capture_output=True, text=True
    ).stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("commit")
    ap.add_argument("--top", type=int, default=40,
                    help="N slowest committed queries to re-run (default 40)")
    ap.add_argument("--names", default=None,
                    help="explicit comma-separated query subset (overrides --top)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    sha = _git("rev-parse", args.commit).strip()
    short = sha[:8]

    committed = json.loads(_git("show", f"{sha}:bench_queries.json"))
    committed_q = committed["queries"]

    if args.names:
        names = [n for n in args.names.split(",") if n in committed_q]
    else:
        names = [
            n for n, _ in sorted(
                committed_q.items(), key=lambda kv: -kv[1]
            )[: args.top]
        ]
    if not names:
        sys.exit("no queries selected (names not in the committed record?)")

    worktree = f"/tmp/databus_ab_{short}"
    if not os.path.isdir(worktree):
        subprocess.run(
            ["git", "worktree", "add", "--detach", worktree, sha],
            cwd=ROOT, check=True,
        )

    # box-health probes from the CURRENT bench (the probe definition is
    # versioned with the tool, not the pinned commit, so A/Bs across
    # rounds stay comparable)
    # plain import (not importlib-from-path): the 32-way parallel probe
    # pickles _probe_work into fork'd workers, which must re-import it
    # by module name — a synthetic module name fails there
    sys.path.insert(0, ROOT)
    import bench

    probe_start = bench._calibration_probe_s()
    par_start = bench._parallel_probe_s()

    out_path = f"/tmp/databus_ab_timings_{short}.json"
    runner_path = f"/tmp/databus_ab_runner_{short}.py"
    with open(runner_path, "w") as f:
        f.write(_RUNNER)
    subprocess.run(
        [sys.executable, runner_path, worktree, args.sf_dir,
         str(args.cpus), out_path, json.dumps(names)],
        check=True,
    )
    with open(out_path) as f:
        rerun = json.load(f)

    probe_end = bench._calibration_probe_s()
    par_end = bench._parallel_probe_s()

    per_query = {}
    ratios = []
    for n in names:
        c, r = committed_q[n], rerun.get(n)
        if r is None or c <= 0:
            continue
        ratio = round(r / c, 3)
        per_query[n] = {"committed": c, "rerun": r, "ratio": ratio}
        ratios.append(ratio)
    ratios.sort()

    def q(p: float) -> float:
        return ratios[min(len(ratios) - 1, int(p * len(ratios)))]

    record = {
        "commit": sha,
        "committed_record_sf": committed.get("sf"),
        "sf_dir": args.sf_dir,
        "n_queries": len(ratios),
        "median_ratio": q(0.5),
        "p25_ratio": q(0.25),
        "p75_ratio": q(0.75),
        "min_ratio": ratios[0],
        "max_ratio": ratios[-1],
        "calibration_probe_start_s": probe_start,
        "calibration_probe_end_s": probe_end,
        "parallel_probe_start_s": par_start,
        "parallel_probe_end_s": par_end,
        "per_query": per_query,
        "protocol": "untimed staging pass, then min-of-2 timed with "
                    "cache clearing; committed side is that commit's "
                    "bench_queries.json (single cold-in-rotation runs)",
    }
    out_file = os.path.join(ROOT, f"HOST_AB_{short}.json")
    with open(out_file, "w") as f:
        json.dump(record, f, indent=2, sort_keys=True)
    compact = {k: v for k, v in record.items() if k != "per_query"}
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
