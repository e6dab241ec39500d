#!/usr/bin/env python
"""Fuzzy-join blocking probes behind the SCALE.md round-12 numbers.

Two measurements over the x100 soak corpus (build it first:
``python tools/soak10x.py --scale 100 --families fuzzy_join``):

* ``--pair-mass``: candidate-pair-mass accounting of the two-level
  blocking under the saturated composite (lang + first-token) key —
  uncapped mass, generated mass, mass dropped BY THE CAP (over-cap
  sub-blocks), and mass separated by the secondary min-gram key.
* ``--gram-recall``: exact brute-force TRUE-pair (prefix edit distance
  <= max_dist) retention of the min-gram split, over the oversized
  blocks small enough to all-pairs in-process (the bound keeps the
  check exact rather than sampled-within-block).

Pure DuckDB + Python (no Spark session) so it runs in seconds and the
numbers are engine-independent restatements of the blocking math in
operators/joins.py.
"""

from __future__ import annotations

import argparse
from collections import defaultdict

import duckdb

SOAK_DOCS = "/tmp/databus_soak10x/documents.parquet/*.parquet"
PREFIX, BUCKET, CAP, GRAM = 64, 16, 256, 4


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW d AS SELECT * FROM read_parquet('{SOAK_DOCS}')"
    )
    return con


_BLOCKS_CTE = f"""
base AS (
  SELECT doc_id, lang || '|' || split_part(text, ' ', 1) AS blk,
         substr(text, 1, {PREFIX}) AS pfx,
         least(n_chars, {PREFIX}) // {BUCKET} AS b0
  FROM d),
blocks AS (SELECT doc_id, blk, pfx, unnest([b0, b0 + 1]) AS bkt FROM base)
"""


def min_gram(p: str | None) -> str | None:
    if p is None:
        return None
    s = p + "\x01" * (GRAM - len(p)) if len(p) < GRAM else p
    return min(s[i : i + GRAM] for i in range(len(s) - GRAM + 1))


def pair_mass() -> None:
    con = _con()
    rows = con.execute(
        f"""
        WITH {_BLOCKS_CTE},
        g AS (SELECT blk, bkt, pfx, count(*) OVER (PARTITION BY blk, bkt) AS n
              FROM blocks)
        SELECT blk, bkt, n, pfx FROM g
        """
    ).fetchall()
    subs: dict = defaultdict(lambda: defaultdict(int))
    tops: dict = {}
    for blk, bkt, n, pfx in rows:
        tops[(blk, bkt)] = n
        sec = "" if n <= CAP else min_gram(pfx)
        subs[(blk, bkt)][sec] += 1
    unc = kept = capd = over_blocks = over_subs = 0
    for key, n in tops.items():
        unc += n * (n - 1) // 2
        if n > CAP:
            over_blocks += 1
        for _sec, m in subs[key].items():
            if m <= CAP:
                kept += m * (m - 1) // 2
            else:
                capd += m * (m - 1) // 2
                over_subs += 1
    split = unc - kept - capd
    print(
        f"blocks={len(tops)} oversized={over_blocks} overcap_subblocks={over_subs}\n"
        f"uncapped={unc} generated={kept} "
        f"cap_dropped={capd} ({capd / unc:.3%}) "
        f"split_separated={split} ({split / unc:.3%})"
    )


def gram_recall(max_members: int, max_dist: int) -> None:
    con = _con()
    rows = con.execute(
        f"""
        WITH {_BLOCKS_CTE},
        pop AS (SELECT blk, bkt, count(*) AS n FROM blocks GROUP BY 1, 2),
        ov AS (SELECT blk, bkt FROM pop WHERE n > {CAP} AND n <= {max_members})
        SELECT b.blk, b.bkt, b.doc_id, b.pfx
        FROM blocks b JOIN ov o ON b.blk = o.blk AND b.bkt = o.bkt
        """
    ).fetchall()

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    blocks: dict = defaultdict(list)
    for blk, bkt, did, pfx in rows:
        blocks[(blk, bkt)].append((did, pfx, min_gram(pfx)))
    tot_true = tot_kept = 0
    for key, mem in blocks.items():
        t = k = 0
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                if lev(mem[i][1], mem[j][1]) <= max_dist:
                    t += 1
                    if mem[i][2] == mem[j][2]:
                        k += 1
        tot_true += t
        tot_kept += k
        print(f"{key[0][:24]} bkt={key[1]} n={len(mem)} true={t} kept={k}")
    print(
        f"TOTAL true={tot_true} kept={tot_kept} "
        f"recall={tot_kept / max(tot_true, 1):.3f}"
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair-mass", action="store_true")
    ap.add_argument("--gram-recall", action="store_true")
    ap.add_argument("--max-members", type=int, default=1500)
    ap.add_argument("--max-dist", type=int, default=12)
    args = ap.parse_args()
    if args.pair_mass or not args.gram_recall:
        pair_mass()
    if args.gram_recall:
        gram_recall(args.max_members, args.max_dist)
