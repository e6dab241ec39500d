"""REPL bootstrap: opt_probe + REST stage attribution.

Usage:  python -i tools/attrib_repl.py   (from /root/repo)
Gives `p` (Probe, sf0.1, 32 cpus, UI on :4049) and `attrib(name)`.
"""

from __future__ import annotations

import json as J
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.opt_probe import Probe  # noqa: E402

p = Probe(extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"})
BASE = "http://localhost:4049/api/v1/applications"


def _stages(app: str):
    return J.load(urllib.request.urlopen(f"{BASE}/{app}/stages?status=complete"))


def attrib(name: str, topn: int = 12, n: int = 1, df_fn=None):
    app = J.load(urllib.request.urlopen(BASE))[0]["id"]
    before = {
        s["stageId"]
        for s in J.load(urllib.request.urlopen(f"{BASE}/{app}/stages"))
    }
    w = p.time(name, n=n, df_fn=df_fn)
    new = [s for s in _stages(app) if s["stageId"] not in before]
    new.sort(key=lambda s: -s["executorRunTime"])
    tot = sum(s["executorRunTime"] for s in new) / 1e3
    print(f"== {name} wall={w:.2f} nstages={len(new)} sum_run={tot:.1f}s")
    for s in new[:topn]:
        print(
            f"  st{s['stageId']:>5} run={s['executorRunTime'] / 1e3:7.2f}s"
            f" cpu={s.get('executorCpuTime', 0) / 1e9:7.2f}s"
            f" tasks={s['numCompleteTasks']:>3}"
            f" in={s['inputBytes'] >> 20}MB"
            f" sh_r={s['shuffleReadBytes'] >> 20}MB"
            f" sh_w={s['shuffleWriteBytes'] >> 20}MB"
        )
    return w


def _dur_ms(v: str) -> float:
    """Parse a Spark UI duration metric total like '1.2 s' / '54 ms' /
    'total (min, med, max...)\\n1.2 s (...)' into milliseconds."""
    import re

    for line in v.split("\n"):
        line = line.strip()
        m = re.match(r"^([\d.,]+)\s*(ms|s|m|h)\b", line)
        if m:
            num = float(m.group(1).replace(",", ""))
            mult = {"ms": 1.0, "s": 1e3, "m": 6e4, "h": 3.6e6}[m.group(2)]
            return num * mult
    return 0.0


def sqlnodes(exec_id: int | None = None, topn: int = 25):
    """Node-level metrics of one SQL execution (default: latest)."""
    app = J.load(urllib.request.urlopen(BASE))[0]["id"]
    sqls = J.load(urllib.request.urlopen(f"{BASE}/{app}/sql?length=500"))
    ex = (
        max(sqls, key=lambda s: s["id"])
        if exec_id is None
        else next(s for s in sqls if s["id"] == exec_id)
    )
    det = J.load(
        urllib.request.urlopen(
            f"{BASE}/{app}/sql/{ex['id']}?details=true&planDescription=false"
        )
    )
    rows = []
    for n in det.get("nodes", []):
        mm = {m["name"]: m["value"] for m in n.get("metrics", [])}
        tot = 0.0
        for k, v in mm.items():
            if "time" in k.lower() and "total" in k.lower():
                tot += _dur_ms(v)
        nrows = mm.get("number of output rows", "")
        rows.append((tot, n["nodeId"], n["nodeName"], nrows))
    rows.sort(key=lambda r: -r[0])
    print(f"== sql exec {ex['id']} dur={ex.get('duration', 0) / 1e3:.2f}s")
    for tot, nid, nm, nrows in rows[:topn]:
        print(f"  {tot / 1e3:8.2f}s  node{nid:>4}  {nm:<40} rows={nrows}")
    return det


def sqllist(last: int = 20):
    app = J.load(urllib.request.urlopen(BASE))[0]["id"]
    sqls = J.load(urllib.request.urlopen(f"{BASE}/{app}/sql?length=500"))
    for s in sorted(sqls, key=lambda s: s["id"])[-last:]:
        print(
            f"  id={s['id']:>4} dur={s.get('duration', 0) / 1e3:8.2f}s"
            f"  {s.get('description', '')[:80]}"
        )


print("PROBE2 READY")
