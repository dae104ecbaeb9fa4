"""Synthetic 1000-tile grid: distributed pose-graph BA at scale.

BASELINE stretch config: a large serpentine-scanned tile grid whose pairwise
offsets (with noise and outliers) feed the distributed least-squares solver,
edges partitioned across the mesh, Schur-style reduction over ``psum``.
Reports solve accuracy vs ground truth and solve throughput.
"""
from __future__ import annotations

import dataclasses
import json
import time
from typing import Optional, Tuple

import numpy as np

from ..parallel.mesh import make_mesh
from ..solver import pose_graph as pg


@dataclasses.dataclass
class GridResult:
    n_tiles: int
    n_edges: int
    mean_abs_err_px: float
    chain_mean_abs_err_px: float
    solve_seconds: float
    n_devices: int


def make_grid_graph(gh: int, gw: int, spacing=(1800.0, 2400.0),
                    noise_px: float = 1.0, outlier_frac: float = 0.02,
                    seed: int = 0) -> Tuple[pg.PoseGraph, np.ndarray]:
    """Serpentine grid with row+col edges, Gaussian noise, and a few
    down-weighted outlier measurements (confidence model)."""
    rng = np.random.default_rng(seed)
    truth = np.array([[i * spacing[0], j * spacing[1]]
                      for i in range(gh) for j in range(gw)], np.float64)
    node = lambda i, j: i * gw + j
    ea, eb, m, w = [], [], [], []
    for i in range(gh):
        for j in range(gw):
            if j + 1 < gw:
                ea.append(node(i, j)); eb.append(node(i, j + 1))
                m.append([0.0, spacing[1]]); w.append(1.0)
            if i + 1 < gh:
                ea.append(node(i, j)); eb.append(node(i + 1, j))
                m.append([spacing[0], 0.0]); w.append(1.0)
    m = np.asarray(m) + rng.normal(0, noise_px, (len(m), 2))
    w = np.asarray(w, np.float32)
    n_out = int(outlier_frac * len(m))
    out_idx = rng.choice(len(m), n_out, replace=False)
    m[out_idx] += rng.normal(0, 200.0, (n_out, 2))   # gross outliers
    w[out_idx] = 0.01                                 # low confidence
    g = pg.PoseGraph(edges_a=np.asarray(ea, np.int32),
                     edges_b=np.asarray(eb, np.int32),
                     measurements=m.astype(np.float32), weights=w,
                     n_nodes=gh * gw)
    return g, truth


def run(gh: int = 25, gw: int = 40, n_devices: Optional[int] = None,
        iters: int = 400, seed: int = 0) -> GridResult:
    g, truth = make_grid_graph(gh, gw, seed=seed)
    import jax
    nd = n_devices or jax.device_count()
    mesh = make_mesh(nd) if nd > 1 else None
    # warm-up compile
    pg.solve(g, iters=iters, mesh=mesh)
    t0 = time.perf_counter()
    x = pg.solve(g, iters=iters, mesh=mesh)
    dt = time.perf_counter() - t0
    err = np.abs((x - x[0]) - (truth - truth[0])).mean()
    # chain baseline: serpentine prefix path (the reference's accumulation)
    chain = np.zeros_like(truth)
    meas = {(a, b): mm for a, b, mm in zip(g.edges_a, g.edges_b,
                                           g.measurements)}
    node = lambda i, j: i * gw + j
    for i in range(gh):
        for j in range(gw):
            if i == 0 and j == 0:
                continue
            if j > 0:
                chain[node(i, j)] = chain[node(i, j - 1)] + \
                    meas[(node(i, j - 1), node(i, j))]
            else:
                chain[node(i, 0)] = chain[node(i - 1, 0)] + \
                    meas[(node(i - 1, 0), node(i, 0))]
    chain_err = np.abs(chain - truth).mean()
    return GridResult(n_tiles=gh * gw, n_edges=len(g.edges_a),
                      mean_abs_err_px=float(err),
                      chain_mean_abs_err_px=float(chain_err),
                      solve_seconds=dt, n_devices=nd)


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--grid", type=int, nargs=2, default=[25, 40])
    p.add_argument("--devices", type=int)
    p.add_argument("--iters", type=int, default=400)
    args = p.parse_args()
    res = run(args.grid[0], args.grid[1], args.devices, args.iters)
    print(json.dumps(dataclasses.asdict(res)))


if __name__ == "__main__":
    main()
