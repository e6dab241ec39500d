#!/usr/bin/env python
"""SemDeDup recall-vs-scan sweep (r9 verdict ask #3).

Replays the engine's EXACT cell-assignment math in numpy over a fixture
embeddings table — hash-sample centroid init (portable_hash64 order),
integer-quantized Lloyd rounds with the dist*k+cell argmin key, and
top-n_probe selection by the same ascending key — then scores
co-location recall of true cosine>=threshold pairs and the scanned pair
fraction against exact all-pairs truth. This is the harness that picked
the (trained, 128 cells, 6 probes) configuration semdedup_recall_eval
pins; SCALE.md records the curve.

Usage: python tools/semdedup_recall_sweep.py [--sf 0.01,0.1]
"""

from __future__ import annotations

import argparse
import hashlib
import json

import duckdb
import numpy as np

KM_SCALE = 1_000_000
THRESHOLD = 0.4


def phash64(val, seed):
    # portable_hash64: first 15 hex chars of md5(seed || '|' || value)
    return int(hashlib.md5(f"{seed}|{val}".encode()).hexdigest()[:15], 16)


def load(sf):
    df = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('/root/testdata/sf{sf}/embeddings.parquet') ORDER BY vec_id"
    ).df()
    return df["vec_id"].to_numpy(), np.array(df["embedding"].tolist(), dtype=np.float64)


def km_train(Q, ids, k, n_iter):
    h = np.array([phash64(v, "ivf") for v in ids])
    order = np.lexsort((ids, h))
    C = Q[order[:k]].copy()
    cell_ids = np.arange(k)
    for _ in range(n_iter):
        d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        key = d * k + cell_ids
        a = key.argmin(axis=1)
        keep, nC = [], []
        for c in range(len(C)):
            m = a == c
            if m.sum():
                nC.append(Q[m].sum(axis=0) // m.sum())
                keep.append(cell_ids[c])
        C, cell_ids = np.array(nC), np.array(keep)
    return C, cell_ids


def eval_cfg(ids, V, Q, trained, k, n_probe, n_iter):
    n = len(ids)
    if trained:
        C, cids = km_train(Q, ids, k, n_iter)
        d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        key = d * k + cids
        probes = [set(cids[np.argsort(key[i])[:n_probe]]) for i in range(n)]
    else:
        h = np.array([phash64(v, "ivf") for v in ids])
        order = np.lexsort((ids, h))
        cent_idx = order[:k]
        nrm = np.linalg.norm(V, axis=1)
        CS = np.round((V @ V[cent_idx].T) / np.outer(nrm, nrm[cent_idx]), 6)
        cell_ids = ids[cent_idx]
        probes = []
        for i in range(n):
            o = sorted(range(k), key=lambda c: (-CS[i, c], cell_ids[c]))
            probes.append(set(cell_ids[[int(x) for x in o[:n_probe]]]))
    nrm = np.linalg.norm(V, axis=1)
    S = np.round((V @ V.T) / np.outer(nrm, nrm), 6)
    iu = np.triu_indices(n, 1)
    tm = S[iu] >= THRESHOLD
    ai, bi = iu
    share = np.array([not probes[a].isdisjoint(probes[b]) for a, b in zip(ai, bi)])
    return float(share[tm].mean()), float(share.mean()), int(tm.sum())


CONFIGS = [
    # (trained, n_cells, n_probe, n_iter)
    (False, 32, 2, 0),   # the r8 multiprobe row's config
    (False, 64, 4, 0),
    (False, 64, 5, 0),
    (False, 128, 6, 0),
    (True, 32, 3, 3),
    (True, 64, 4, 3),
    (True, 64, 5, 3),
    (True, 96, 6, 3),
    (True, 128, 6, 3),   # pinned by semdedup_recall_eval
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.01,0.1")
    args = ap.parse_args()
    out = []
    for sf in args.sf.split(","):
        ids, V = load(sf)
        Q = np.floor((np.clip(V, -1, 1) + 1.0) * KM_SCALE).astype(np.int64)
        for trained, k, npb, it in CONFIGS:
            r, s, nt = eval_cfg(ids, V, Q, trained, k, npb, it)
            row = {
                "sf": sf, "centroids": "trained" if trained else "hash",
                "n_cells": k, "n_probe": npb,
                "recall": round(r, 3), "scan_frac": round(s, 3),
                "n_true_pairs": nt,
            }
            out.append(row)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
