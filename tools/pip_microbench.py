"""Microbenchmark the PIP ray-cast kernel under multiprocess contention —
the scaling-efficiency lever: the kernel must scale 4→16 procs like raw CPU
(≈0.81 on this VM), which means its working set must stay out of the shared
L3.  Sweeps chunk size × kernel variant at two process counts.

Usage: python tools/pip_microbench.py [reps]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_workload(n_points=65_536, n_edges=800, seed=3):
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n_edges))
    r = 5.0 + rng.uniform(-2, 2, n_edges)
    ring = np.stack([r * np.sin(ang), r * np.cos(ang)], axis=1)
    ring = np.vstack([ring, ring[:1]])
    edges = np.stack([ring[:-1, 0], ring[:-1, 1], ring[1:, 0], ring[1:, 1]], axis=1)
    lats = rng.uniform(-8, 8, n_points)
    lons = rng.uniform(-8, 8, n_points)
    return lats, lons, edges


def kernel_div(ys, xs, edges, chunk_elems):
    y1 = edges[:, 0][None, :]
    x1 = edges[:, 1][None, :]
    y2 = edges[:, 2][None, :]
    x2 = edges[:, 3][None, :]
    m = edges.shape[0]
    chunk = max(64, chunk_elems // m)
    out = np.empty(ys.shape[0], dtype=bool)
    for i in range(0, ys.shape[0], chunk):
        y = ys[i : i + chunk, None]
        x = xs[i : i + chunk, None]
        straddle = (y1 <= y) != (y2 <= y)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (y - y1) / (y2 - y1)
            xi = x1 + t * (x2 - x1)
        out[i : i + chunk] = ((straddle & (x < xi)).sum(axis=1) % 2).astype(bool)
    return out


def kernel_nodiv(ys, xs, edges, chunk_elems):
    y1 = edges[:, 0][None, :]
    x1 = edges[:, 1][None, :]
    y2 = edges[:, 2][None, :]
    x2 = edges[:, 3][None, :]
    d = y2 - y1
    s = np.sign(d)
    ad = d * s
    sdx = (x2 - x1) * s
    m = edges.shape[0]
    chunk = max(64, chunk_elems // m)
    out = np.empty(ys.shape[0], dtype=bool)
    for i in range(0, ys.shape[0], chunk):
        y = ys[i : i + chunk, None]
        x = xs[i : i + chunk, None]
        straddle = (y1 <= y) != (y2 <= y)
        lhs = (x - x1) * ad
        rhs = (y - y1) * sdx
        cross = straddle & (lhs < rhs)
        out[i : i + chunk] = (cross.sum(axis=1) % 2).astype(bool)
    return out


def worker(kname, chunk_elems, reps, q):
    lats, lons, edges = make_workload()
    k = kernel_div if kname == "div" else kernel_nodiv
    k(lats[:1000], lons[:1000], edges, chunk_elems)  # warm
    t0 = time.monotonic()
    for _ in range(reps):
        k(lats, lons, edges, chunk_elems)
    q.put(time.monotonic() - t0)


def run_parallel(kname, chunk_elems, nproc, reps):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(kname, chunk_elems, reps, q)) for _ in range(nproc)]
    t0 = time.monotonic()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    wall = time.monotonic() - t0
    _ = [q.get() for _ in ps]
    total_evals = nproc * reps * 65_536
    return total_evals / wall  # points/sec aggregate


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    results = {}
    for kname in ("div", "nodiv"):
        for chunk in (16_384, 32_768, 65_536, 131_072, 262_144, 1_048_576):
            thr = {}
            for nproc in (4, 16):
                vals = [run_parallel(kname, chunk, nproc, reps) for _ in range(3)]
                thr[nproc] = max(vals)
            eff = (thr[16] / thr[4]) / 4
            results[f"{kname}/{chunk}"] = {
                "thr4": round(thr[4] / 1e6, 2),
                "thr16": round(thr[16] / 1e6, 2),
                "eff": round(eff, 3),
            }
            print(kname, chunk, results[f"{kname}/{chunk}"], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
