#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Every query is forced through a noop sink (full materialization, no
driver collect), so timings reflect the whole plan — scan, shuffle,
aggregate — not a count-pruned shortcut.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from databus_spark.session import build_session

    spark = build_session("databus_spark_bench", cpus=cpus)

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    headline = [name for name in queries]

    def clear_caches() -> None:
        """Drop cached/checkpointed blocks between queries so one query's
        storage pressure doesn't evict another's localCheckpoint blocks."""
        spark.catalog.clearCache()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rdd in list(jmap.values()):
                rdd.unpersist(True)  # blocking: blocks actually freed
            spark._jvm.System.gc()
        except Exception:
            pass

    timings: dict[str, float] = {}
    total = 0.0
    for name in headline:
        clear_caches()
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt

    # Headline throughput: change-stream apply — full multi-source changelog
    # compacted to latest-state (the reference's applier hot path).
    from databus_spark.envelope import multi_source_changelog
    from databus_spark.operators.compaction import latest_by_key

    log = multi_source_changelog(spark, sf_dir)
    n_changes = log.count()
    t0 = time.time()
    latest_by_key(log).write.format("noop").mode("overwrite").save()
    apply_secs = time.time() - t0
    timings["apply_multi_source"] = round(apply_secs, 3)
    total += apply_secs

    out = {
        "metric": "headline_suite_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(headline),
        "changelog_rows": n_changes,
        "apply_rows_per_sec": round(n_changes / max(apply_secs, 1e-9), 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
