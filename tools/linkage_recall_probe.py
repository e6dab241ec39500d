#!/usr/bin/env python
"""Fuzzy-join blocking probes behind the SCALE.md round-12/13 numbers.

Measurements over the x100 soak corpus (build it first:
``python tools/soak10x.py --scale 100 --families fuzzy_join``):

* ``--pair-mass``: candidate-pair-mass accounting of the two-level
  blocking WITH the r13 clone collapse, under the saturated composite
  (lang + first-token) key — uncapped member-pair mass, generated mass
  (within-clone-group pairs are unconditional + cross-group pairs of
  kept rep sub-blocks), mass dropped BY THE CAP (cross-group pairs of
  over-cap rep sub-blocks — within-group mass can never drop), and
  cross mass separated by the secondary min-gram key.
* ``--gram-recall``: TRUE-pair (prefix edit distance <= max_dist)
  retention of the split+collapse over ALL oversized blocks — exact
  brute-force where the block is small enough to all-pairs in-process,
  stratified SAMPLED (seeded pairs, DP-verified, Wilson 95% CI) above
  that, so the estimate spans the whole block-size distribution
  instead of the two smallest blocks (r12 verdict #5).

Pure DuckDB + Python (no Spark session) so it runs in seconds and the
numbers are engine-independent restatements of the blocking math in
operators/joins.py.
"""

from __future__ import annotations

import argparse
import math
import random
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
blocks AS (
  SELECT doc_id, blk, pfx, b0, unnest([b0, b0 + 1]) AS bkt FROM base)
"""


def min_gram(p: str | None) -> str | None:
    if p is None:
        return None
    s = p + "\x01" * (GRAM - len(p)) if len(p) < GRAM else p
    return min(s[i : i + GRAM] for i in range(len(s) - GRAM + 1))


def _c2(n: int) -> int:
    return n * (n - 1) // 2


def pair_mass() -> None:
    """Member-pair-mass accounting per (blk, bkt) top block, with the
    clone collapse: populations/caps apply to DISTINCT-PREFIX groups,
    within-group mass is unconditional, and only CROSS-group mass of
    over-cap rep sub-blocks drops."""
    con = _con()
    rows = con.execute(
        f"""
        WITH {_BLOCKS_CTE}
        SELECT blk, bkt, b0, pfx, count(*) AS m
        FROM blocks GROUP BY 1, 2, 3, 4
        """
    ).fetchall()
    # per (blk, bkt): the clone groups (keyed (b0, pfx)) with sizes
    top: dict = defaultdict(list)
    for blk, bkt, b0, pfx, m in rows:
        top[(blk, bkt)].append((pfx, m))
    unc = within = cross_kept = cross_drop = cross_split = 0
    over_blocks = over_subs = 0
    for _key, groups in top.items():
        n = sum(m for _p, m in groups)
        w = sum(_c2(m) for _p, m in groups)
        unc += _c2(n)
        within += w  # unconditional under the collapse
        cross_total = _c2(n) - w
        r = len(groups)  # rep population: what the cap now counts
        if r <= CAP:
            cross_kept += cross_total
            continue
        over_blocks += 1
        subs: dict = defaultdict(list)
        for pfx, m in groups:
            subs[min_gram(pfx)].append(m)
        sub_cross_sum = 0
        for _sec, ms in subs.items():
            ns, ws = sum(ms), sum(_c2(m) for m in ms)
            sub_cross = _c2(ns) - ws
            sub_cross_sum += sub_cross
            if len(ms) <= CAP:
                cross_kept += sub_cross
            else:
                cross_drop += sub_cross
                over_subs += 1
        cross_split += cross_total - sub_cross_sum
    gen = within + cross_kept
    print(
        f"blocks={len(top)} oversized(rep-pop)={over_blocks} "
        f"overcap_subblocks={over_subs}\n"
        f"uncapped={unc} generated={gen} "
        f"(within-clone={within} cross_kept={cross_kept})\n"
        f"cap_dropped={cross_drop} ({cross_drop / max(unc, 1):.3%}) "
        f"split_separated={cross_split} ({cross_split / max(unc, 1):.3%})"
    )


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _wilson(k: int, n: int, z: float = 1.96) -> tuple[float, float]:
    if n == 0:
        return (0.0, 1.0)
    p = k / n
    den = 1 + z * z / n
    mid = (p + z * z / (2 * n)) / den
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
    return (max(0.0, mid - half), min(1.0, mid + half))


def gram_recall(max_members: int, max_dist: int, n_samples: int, seed: int) -> None:
    """True-pair retention over EVERY oversized (rep-pop > CAP) block.

    A pair is KEPT under the r13 semantics iff the two prefixes are
    identical (clone pair: unconditional) or they share the min-gram
    AND their sub-block's rep population is <= CAP. Blocks with
    <= max_members members are brute-forced exactly; larger blocks are
    estimated from ``n_samples`` seeded uniform member pairs with a
    Wilson 95% CI on the conditional kept|true proportion."""
    con = _con()
    rows = con.execute(
        f"""
        WITH {_BLOCKS_CTE},
        pop AS (
            SELECT blk, bkt, count(DISTINCT pfx) AS r, count(*) AS n
            FROM blocks GROUP BY 1, 2),
        ov AS (SELECT blk, bkt, n FROM pop WHERE r > {CAP})
        SELECT b.blk, b.bkt, b.doc_id, b.pfx
        FROM blocks b JOIN ov o ON b.blk = o.blk AND b.bkt = o.bkt
        """
    ).fetchall()
    blocks: dict = defaultdict(list)
    for blk, bkt, did, pfx in rows:
        blocks[(blk, bkt)].append((did, pfx))
    rng = random.Random(seed)
    tot_true = tot_kept = 0  # pooled over exact + sampled true pairs
    n_exact = n_sampled = 0
    sizes = sorted(len(m) for m in blocks.values())
    for key, mem in sorted(blocks.items(), key=lambda kv: len(kv[1])):
        # sub-block rep populations for the kept-rule (per this block)
        reps_per_sec: dict = defaultdict(set)
        for _did, pfx in mem:
            reps_per_sec[min_gram(pfx)].add(pfx)
        sub_ok = {sec: len(ps) <= CAP for sec, ps in reps_per_sec.items()}

        def kept(pi: str, pj: str) -> bool:
            if pi == pj:
                return True
            gi, gj = min_gram(pi), min_gram(pj)
            return gi == gj and sub_ok[gi]

        n = len(mem)
        if n <= max_members:
            t = k = 0
            for i in range(n):
                for j in range(i + 1, n):
                    if _lev(mem[i][1], mem[j][1]) <= max_dist:
                        t += 1
                        if kept(mem[i][1], mem[j][1]):
                            k += 1
            n_exact += 1
            mode = f"exact pairs={_c2(n)}"
        else:
            t = k = 0
            for _ in range(n_samples):
                i = rng.randrange(n)
                j = rng.randrange(n - 1)
                if j >= i:
                    j += 1
                if _lev(mem[i][1], mem[j][1]) <= max_dist:
                    t += 1
                    if kept(mem[i][1], mem[j][1]):
                        k += 1
            n_sampled += 1
            mode = f"sampled pairs={n_samples}"
        tot_true += t
        tot_kept += k
        lo, hi = _wilson(k, t)
        print(
            f"{key[0][:24]} bkt={key[1]} n={n} [{mode}] true={t} kept={k} "
            f"recall={k / max(t, 1):.3f} ci95=[{lo:.3f},{hi:.3f}]"
        )
    lo, hi = _wilson(tot_kept, tot_true)
    print(
        f"TOTAL blocks={len(blocks)} (exact={n_exact} sampled={n_sampled}) "
        f"sizes={sizes[:3]}..{sizes[-3:] if len(sizes) >= 3 else sizes}\n"
        f"true={tot_true} kept={tot_kept} "
        f"recall={tot_kept / max(tot_true, 1):.3f} ci95=[{lo:.3f},{hi:.3f}]"
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair-mass", action="store_true")
    ap.add_argument("--gram-recall", action="store_true")
    ap.add_argument("--max-members", type=int, default=1500)
    ap.add_argument("--max-dist", type=int, default=12)
    ap.add_argument("--samples", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=13)
    args = ap.parse_args()
    if args.pair_mass or not args.gram_recall:
        pair_mass()
    if args.gram_recall:
        gram_recall(args.max_members, args.max_dist, args.samples, args.seed)
