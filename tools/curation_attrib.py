#!/usr/bin/env python
"""Per-stage attribution of the curation family's soak memory (r9 ask #8).

curation_decisions_v2 composes four doc_id-keyed derivations; the x100
soak records one aggregate peak-task-memory number (3.0 GB in r8).
This tool runs each derivation under its own job group on the
soak-staged corpus and parses the event log, so the peak attributes to
a stage instead of a family. Reuses tools/soak10x.py's fixture and
event-log parser.

Usage: python tools/curation_attrib.py [--dir /tmp/databus_soak10x]
       (run after soak10x has staged the target scale)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EVENT_DIR = "/tmp/databus_curation_attrib_events"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/databus_soak10x")
    args = ap.parse_args()

    from soak10x import parse_event_log

    from databus_spark.session import build_session

    shutil.rmtree(EVENT_DIR, ignore_errors=True)
    os.makedirs(EVENT_DIR, exist_ok=True)
    spark = build_session(
        "databus_curation_attrib",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVENT_DIR}",
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext

    from pyspark.sql import functions as F

    from databus_spark.operators import text
    from databus_spark.operators.dedup import decontaminate
    from databus_spark.registry import _v1_decisions

    docs = (
        spark.read.parquet(os.path.join(args.dir, "documents.parquet"))
        .select("doc_id", "text")
        .localCheckpoint(eager=False)
    )
    corpus = docs.where(F.col("doc_id") % 17 != 0)
    benchmark = docs.where(F.col("doc_id") % 17 == 0)

    stages = {
        "v1_signals": lambda: _v1_decisions(corpus),
        "decontaminate_8gram": lambda: decontaminate(corpus, benchmark),
        "lm_train_score": lambda: text.lm_quality_score(docs),
    }
    walls = {}
    for name, fn in stages.items():
        sc.setJobGroup(name, name)
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        walls[name] = round(time.time() - t0, 2)
        print(f"{name}: {walls[name]}s", flush=True)
    sc.setJobGroup("idle", "idle")
    spark.stop()

    metrics = parse_event_log(EVENT_DIR)
    out = {}
    for name in stages:
        m = metrics.get(name, {})
        out[name] = {
            "wall_s": walls[name],
            "peak_task_mem_mb": round(m.get("peak_task_mem_b", 0) / 1e6, 1),
            "shuffle_mb": round(m.get("shuffle_write_b", 0) / 1e6, 1),
            "spill_mb": round(m.get("spill_b", 0) / 1e6, 1),
            "n_tasks": m.get("n_tasks", 0),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
