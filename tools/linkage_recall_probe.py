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


def _min_gram_sql(expr: str, gram: int = GRAM) -> str:
    """DuckDB twin of min_gram (mirrors operators/joins._min_gram_sql)."""
    padded = (
        f"CASE WHEN length({expr}) < {gram} "
        f"THEN rpad({expr}, {gram}, chr(1)) ELSE {expr} END"
    )
    return (
        f"list_min(list_transform("
        f"range(1, length({padded}) - {gram - 2}), "
        f"i -> substr({padded}, CAST(i AS INT), {gram})))"
    )


def _c2(n: int) -> int:
    return n * (n - 1) // 2


# THE pinned blocking bounds (r13 verdict next-#3): cap-dropped pair
# mass stays under 0.5% of uncapped mass and the CI-sampled true-pair
# recall stays at or above 0.99 on the x100 probe. --assert-bounds
# enforces both with a nonzero exit, and the run's numbers are
# committed as LINKAGE_BOUNDS.json (tests/test_round14_ops.py re-checks
# the committed record against these constants, so a blocking
# regression cannot silently reopen the hole the r13 clone collapse +
# tertiary split closed: 8.8% -> 0.279% dropped, recall 0.993).
MAX_DROPPED_FRAC = 0.005
MIN_RECALL = 0.99


def pair_mass() -> dict:
    """Member-pair-mass accounting per (blk, bkt) top block, with the
    clone collapse AND the tertiary reversed-min-gram split:
    populations/caps apply to DISTINCT-PREFIX groups, within-group
    mass is unconditional, over-cap rep sub-blocks re-split on the
    second key, and only CROSS-group mass of sub-sub-blocks still over
    cap drops."""
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
    over_blocks = over_subs = over_subs2 = 0
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
            subs[min_gram(pfx)].append((pfx, m))
        sub_cross_sum = 0
        for _sec, gs in subs.items():
            ns = sum(m for _p, m in gs)
            ws = sum(_c2(m) for _p, m in gs)
            sub_cross = _c2(ns) - ws
            sub_cross_sum += sub_cross
            if len(gs) <= CAP:
                cross_kept += sub_cross
                continue
            over_subs += 1
            # tertiary: re-split on the reversed-prefix min-gram
            subs2: dict = defaultdict(list)
            for pfx, m in gs:
                subs2[min_gram(pfx[::-1])].append(m)
            sub2_cross_sum = 0
            for _sec2, ms in subs2.items():
                ns2, ws2 = sum(ms), sum(_c2(m) for m in ms)
                s2_cross = _c2(ns2) - ws2
                sub2_cross_sum += s2_cross
                if len(ms) <= CAP:
                    cross_kept += s2_cross
                else:
                    cross_drop += s2_cross
                    over_subs2 += 1
            cross_split += sub_cross - sub2_cross_sum
        cross_split += cross_total - sub_cross_sum
    gen = within + cross_kept
    print(
        f"blocks={len(top)} oversized(rep-pop)={over_blocks} "
        f"overcap_subblocks={over_subs} overcap_after_tertiary={over_subs2}\n"
        f"uncapped={unc} generated={gen} "
        f"(within-clone={within} cross_kept={cross_kept})\n"
        f"cap_dropped={cross_drop} ({cross_drop / max(unc, 1):.3%}) "
        f"split_separated={cross_split} ({cross_split / max(unc, 1):.3%})"
    )
    return {
        "blocks": len(top),
        "oversized_blocks": over_blocks,
        "overcap_subblocks": over_subs,
        "overcap_after_tertiary": over_subs2,
        "uncapped_pairs": unc,
        "generated_pairs": gen,
        "cap_dropped_pairs": cross_drop,
        "cap_dropped_frac": round(cross_drop / max(unc, 1), 6),
    }


def _wilson(k: int, n: int, z: float = 1.96) -> tuple[float, float]:
    if n == 0:
        return (0.0, 1.0)
    p = k / n
    den = 1 + z * z / n
    mid = (p + z * z / (2 * n)) / den
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / den
    return (max(0.0, mid - half), min(1.0, mid + half))


def gram_recall(max_members: int, max_dist: int, n_samples: int, seed: int) -> dict:
    """True-pair retention over EVERY oversized (rep-pop > CAP) block.

    A pair is KEPT under the r13 semantics iff the two prefixes are
    identical (clone pair: unconditional), or they share the min-gram
    AND their sub-block's rep population is <= CAP, or (sub over cap)
    they also share the reversed-prefix min-gram AND that sub-sub-
    block's rep population is <= CAP. Blocks with <= max_members
    members are brute-forced exactly; larger blocks are estimated from
    ``n_samples`` seeded uniform member pairs with a Wilson 95% CI on
    the conditional kept|true proportion. The Levenshtein DP and the
    kept-rule run inside DuckDB (native) — the pure-python DP version
    needed hours at x100."""
    con = _con()
    g1 = _min_gram_sql("pfx")
    g2 = _min_gram_sql("reverse(pfx)")
    con.execute(
        f"""
        CREATE TEMP TABLE mem AS
        WITH {_BLOCKS_CTE},
        pop AS (
            SELECT blk, bkt, count(DISTINCT pfx) AS r FROM blocks GROUP BY 1, 2),
        ov AS (SELECT blk, bkt FROM pop WHERE r > {CAP})
        SELECT b.blk, b.bkt,
               row_number() OVER (PARTITION BY b.blk, b.bkt
                                  ORDER BY b.doc_id) - 1 AS idx,
               b.pfx, {g1} AS g1, {g2} AS g2
        FROM blocks b JOIN ov o ON b.blk = o.blk AND b.bkt = o.bkt
        """
    )
    con.execute(
        f"""
        CREATE TEMP TABLE subok AS
        SELECT blk, bkt, g1, count(DISTINCT pfx) <= {CAP} AS ok
        FROM mem GROUP BY 1, 2, 3
        """
    )
    con.execute(
        f"""
        CREATE TEMP TABLE sub2ok AS
        SELECT blk, bkt, g1, g2, count(DISTINCT pfx) <= {CAP} AS ok
        FROM mem GROUP BY 1, 2, 3, 4
        """
    )
    kept_expr = """
        (a.pfx = b.pfx OR (a.g1 = b.g1 AND
            (so.ok OR (a.g2 = b.g2 AND s2.ok))))
    """
    kept_joins = """
        JOIN subok so ON so.blk = a.blk AND so.bkt = a.bkt AND so.g1 = a.g1
        JOIN sub2ok s2 ON s2.blk = a.blk AND s2.bkt = a.bkt
             AND s2.g1 = a.g1 AND s2.g2 = a.g2
    """
    sizes = dict(
        ((blk, bkt), n)
        for blk, bkt, n in con.execute(
            "SELECT blk, bkt, count(*) FROM mem GROUP BY 1, 2"
        ).fetchall()
    )
    # the exact leg must see ONLY brute-forceable blocks BEFORE the
    # self-join (a size filter after the join materializes C(100k,2))
    con.execute(
        f"""
        CREATE TEMP TABLE mem_small AS
        SELECT m.* FROM mem m
        JOIN (SELECT blk, bkt FROM mem GROUP BY 1, 2
              HAVING count(*) <= {max_members}) s
          ON s.blk = m.blk AND s.bkt = m.bkt
        """
    )
    rng = random.Random(seed)
    samp_rows = []
    for (blk, bkt), n in sizes.items():
        if n > max_members:
            for _ in range(n_samples):
                i = rng.randrange(n)
                j = rng.randrange(n - 1)
                if j >= i:
                    j += 1
                samp_rows.append((blk, bkt, min(i, j), max(i, j)))
    import pandas as pd

    samp_df = pd.DataFrame(samp_rows, columns=["blk", "bkt", "i", "j"])
    con.register("samp_df", samp_df)
    con.execute("CREATE TEMP TABLE samp AS SELECT * FROM samp_df")
    per_block = con.execute(
        f"""
        SELECT blk, bkt, mode, sum(is_true) AS t, sum(is_true * is_kept) AS k
        FROM (
            SELECT a.blk, a.bkt, 'exact' AS mode,
                   CAST(levenshtein(a.pfx, b.pfx) <= {max_dist} AS INT) AS is_true,
                   CAST({kept_expr} AS INT) AS is_kept
            FROM mem_small a
            JOIN mem_small b ON b.blk = a.blk AND b.bkt = a.bkt AND b.idx < a.idx
            {kept_joins}
            UNION ALL
            SELECT a.blk, a.bkt, 'sampled',
                   CAST(levenshtein(a.pfx, b.pfx) <= {max_dist} AS INT),
                   CAST({kept_expr} AS INT)
            FROM samp s
            JOIN mem a ON a.blk = s.blk AND a.bkt = s.bkt AND a.idx = s.i
            JOIN mem b ON b.blk = s.blk AND b.bkt = s.bkt AND b.idx = s.j
            {kept_joins}
        )
        GROUP BY 1, 2, 3 ORDER BY 2, 1
        """
    ).fetchall()
    tot_true = tot_kept = n_exact = n_sampled = 0
    for blk, bkt, mode, t, k in per_block:
        t, k = int(t or 0), int(k or 0)
        tot_true += t
        tot_kept += k
        n_exact += mode == "exact"
        n_sampled += mode == "sampled"
        lo, hi = _wilson(k, t)
        print(
            f"{str(blk)[:24]} bkt={bkt} n={sizes[(blk, bkt)]} [{mode}] "
            f"true={t} kept={k} recall={k / max(t, 1):.3f} "
            f"ci95=[{lo:.3f},{hi:.3f}]"
        )
    lo, hi = _wilson(tot_kept, tot_true)
    szs = sorted(sizes.values())
    print(
        f"TOTAL blocks={len(sizes)} (exact={n_exact} sampled={n_sampled}) "
        f"sizes={szs[:3]}..{szs[-3:] if len(szs) >= 3 else szs}\n"
        f"true={tot_true} kept={tot_kept} "
        f"recall={tot_kept / max(tot_true, 1):.3f} ci95=[{lo:.3f},{hi:.3f}]"
    )
    return {
        "oversized_blocks": len(sizes),
        "exact_blocks": n_exact,
        "sampled_blocks": n_sampled,
        "true_pairs": tot_true,
        "kept_pairs": tot_kept,
        "recall": round(tot_kept / max(tot_true, 1), 6),
        "recall_ci95": [round(lo, 6), round(hi, 6)],
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair-mass", action="store_true")
    ap.add_argument("--gram-recall", action="store_true")
    ap.add_argument(
        "--assert-bounds", action="store_true",
        help="run BOTH probes, write LINKAGE_BOUNDS.json at the repo "
             "root, exit 1 if dropped mass or recall violates the "
             "pinned bounds",
    )
    ap.add_argument("--max-members", type=int, default=1500)
    ap.add_argument("--max-dist", type=int, default=12)
    ap.add_argument("--samples", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=13)
    args = ap.parse_args()
    if args.assert_bounds:
        import json
        import os
        import sys

        rec = {"pair_mass": pair_mass(), "scale_corpus": SOAK_DOCS,
               "max_dropped_frac": MAX_DROPPED_FRAC, "min_recall": MIN_RECALL}
        rec["gram_recall"] = gram_recall(
            args.max_members, args.max_dist, args.samples, args.seed
        )
        ok = (
            rec["pair_mass"]["cap_dropped_frac"] < MAX_DROPPED_FRAC
            and rec["gram_recall"]["recall"] >= MIN_RECALL
        )
        rec["bounds_ok"] = ok
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "LINKAGE_BOUNDS.json"), "w") as f:
            json.dump(rec, f, indent=2, sort_keys=True)
        print(json.dumps({k: v for k, v in rec.items() if k != "scale_corpus"}))
        sys.exit(0 if ok else 1)
    if args.pair_mass or not args.gram_recall:
        pair_mass()
    if args.gram_recall:
        gram_recall(args.max_members, args.max_dist, args.samples, args.seed)
