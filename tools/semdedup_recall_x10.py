#!/usr/bin/env python
"""SemDeDup recall at a THIRD decade (r10 verdict ask #5).

The 128-cell/6-probe dial is measured at sf0.01 (500 vecs) and sf0.1
(2,000 vecs); SCALE.md states the transfer rule — hold per-cell
population by scaling n_cells with N — but no measurement existed past
sf0.1. This tool replays the ENGINE's exact cell-assignment math
(portable_hash64 'kmeans' seeded init, integer-quantized Lloyd with
the dist*k+cell argmin key, empty cells dropped, top-n_probe by the
same ascending key) in exact numpy arithmetic over the x10 soak
embedding corpus (20,000 vecs: sf0.1 rotated-replica scheme from
tools/soak10x.py — component rotation keeps within-replica cosine
geometry exact while decorrelating cross-replica vectors), and scores
FULL all-pairs co-location recall/scan, not a sample.

Exactness notes: quantized values are <= 2e6, squared-distance sums
<= 64*(2e6)^2 = 2.6e14 < 2^53, so float64 BLAS matmuls are exact for
the distance pieces; the argmin key d*k + cell (up to 3.3e17 at
k=1280) is computed in int64 where float64 would round.

Usage: python tools/semdedup_recall_x10.py [--scale 10]
"""

from __future__ import annotations

import argparse
import hashlib
import json

import duckdb
import numpy as np

KM_SCALE = 1_000_000
THRESHOLD = 0.4
REPLICA_STRIDE = 100_000_000  # tools/soak10x.py


def phash64(val: str, seed: str) -> int:
    return int(hashlib.md5(f"{seed}|{val}".encode()).hexdigest()[:15], 16)


def load_x(scale: int):
    df = duckdb.sql(
        "SELECT vec_id, embedding FROM "
        "read_parquet('/root/testdata/sf0.1/embeddings.parquet') ORDER BY vec_id"
    ).df()
    ids0 = df["vec_id"].to_numpy()
    V0 = np.array(df["embedding"].tolist(), dtype=np.float64)
    dim = V0.shape[1]
    ids, V = [], []
    for rep in range(scale):
        r = rep % dim
        ids.append(ids0 + rep * REPLICA_STRIDE)
        V.append(np.roll(V0, -r, axis=1) if r else V0)  # component rotation
    return np.concatenate(ids), np.vstack(V)


def quant(V: np.ndarray) -> np.ndarray:
    return np.floor((np.clip(V, -1.0, 1.0) + 1.0) * KM_SCALE).astype(np.int64)


def sq_dists(Q: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Exact int64 squared L2 via float64 BLAS (values < 2^53)."""
    Qf, Cf = Q.astype(np.float64), C.astype(np.float64)
    d = (
        (Qf * Qf).sum(axis=1)[:, None]
        + (Cf * Cf).sum(axis=1)[None, :]
        - 2.0 * (Qf @ Cf.T)
    )
    return np.rint(d).astype(np.int64)


def km_train(Q: np.ndarray, ids: np.ndarray, k: int, n_iter: int):
    """Engine _km_init/_km_assign/_km_update replayed exactly."""
    h = np.array([phash64(str(v), "kmeans") for v in ids])
    order = np.lexsort((ids, h))
    C = Q[order[:k]].copy()
    cell_ids = np.arange(k, dtype=np.int64)
    for _ in range(n_iter):
        key = sq_dists(Q, C) * k + cell_ids[None, :]
        a = key.argmin(axis=1)
        keep, nC = [], []
        for ci in range(len(C)):
            m = a == ci
            if m.any():  # empty cells drop (engine _km_update groupBy)
                nC.append(Q[m].sum(axis=0) // int(m.sum()))
                keep.append(cell_ids[ci])
        C = np.array(nC, dtype=np.int64)
        cell_ids = np.array(keep, dtype=np.int64)
    return C, cell_ids


def eval_cfg(ids, V, Q, k, n_probe, n_iter):
    n = len(ids)
    C, cids = km_train(Q, ids, k, n_iter)
    key = sq_dists(Q, C) * k + cids[None, :]
    top = np.argpartition(key, min(n_probe, key.shape[1] - 1), axis=1)[:, :n_probe]
    # probe membership matrix over the dense 0..k-1 cell id space
    P = np.zeros((n, k), dtype=np.float32)
    rows = np.repeat(np.arange(n), top.shape[1])
    P[rows, cids[top.ravel()]] = 1.0

    nrm = np.linalg.norm(V, axis=1)
    n_true = n_coloc = n_cand = n_pairs = 0
    blk = 4096
    for i0 in range(0, n, blk):
        i1 = min(i0 + blk, n)
        S = np.round((V[i0:i1] @ V.T) / np.outer(nrm[i0:i1], nrm), 6)
        share = (P[i0:i1] @ P.T) > 0.5
        # strict upper triangle only
        cols = np.arange(n)[None, :]
        mask = cols > np.arange(i0, i1)[:, None]
        tm = (S >= THRESHOLD) & mask
        n_pairs += int(mask.sum())
        n_true += int(tm.sum())
        n_coloc += int((tm & share).sum())
        n_cand += int((share & mask).sum())
    return {
        "n_pairs": n_pairs,
        "n_true_pairs": n_true,
        "recall": round(n_coloc / max(n_true, 1), 3),
        "scan_frac": round(n_cand / max(n_pairs, 1), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument(
        "--cfg",
        nargs="*",
        default=None,
        metavar="CELLS:PROBES",
        help="explicit (n_cells, n_probe) configs, e.g. 1280:24 640:18",
    )
    ap.add_argument(
        "--auto",
        action="store_true",
        help="evaluate the ENGINE-derived dial (similarity.semdedup_dial)"
        " for this corpus size — pins that the in-operator rule"
        " reproduces the measured third-decade point",
    )
    args = ap.parse_args()
    ids, V = load_x(args.scale)
    Q = quant(V)
    n = len(ids)
    cfgs = []
    if args.cfg:
        cfgs += [tuple(int(x) for x in c.split(":")) for c in args.cfg]
    if args.auto:
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from databus_spark.operators.similarity import semdedup_dial

        k, p = semdedup_dial(n)
        cfgs.append((k, p))
    if not cfgs:
        # sf0.1 pins 128 cells for 2,000 vecs (~15.6 vecs/cell). The
        # scale rule holds per-cell population: n_cells = N/15.6.
        # Measure the rule's value (scaled) against the unscaled
        # counterfactual and one half-step.
        cfgs = [(k, 6) for k in (128, 640, 128 * args.scale)]
    for k, p in cfgs:
        row = {"n_vecs": n, "n_cells": k, "n_probe": p, "centroids": "trained"}
        row.update(eval_cfg(ids, V, Q, k, p, 3))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
