"""Stretch-config pipeline (BASELINE stretch row; VERDICT r2 item 8)."""
import numpy as np

from imagestitch_tpu.eval import stretch
from imagestitch_tpu.solver import loop_closure


def _brute_force_edges(positions, image_shape, min_frac, max_candidates):
    h, w = image_shape
    pos = np.asarray(positions, np.float64)
    n = len(pos)
    cands = []
    for i in range(n):
        for j in range(i + 2, n):
            ov_r = h - abs(pos[j, 0] - pos[i, 0])
            ov_c = w - abs(pos[j, 1] - pos[i, 1])
            if ov_r <= 0 or ov_c <= 0:
                continue
            frac = (ov_r * ov_c) / (h * w)
            if frac >= min_frac:
                cands.append((frac, i, j))
    cands.sort(reverse=True)
    return [(i, j) for _, i, j in cands[:max_candidates]]


def test_spatial_hash_equals_bruteforce(rng):
    """The O(n*density) spatial-hash proposal finds exactly the O(n^2)
    brute-force candidate set."""
    h, w = 96, 128
    pos = np.stack([rng.uniform(0, 500, 120), rng.uniform(0, 700, 120)],
                   axis=1)
    got = loop_closure.propose_edges(pos, (h, w), 0.04, 10000)
    want = _brute_force_edges(pos, (h, w), 0.04, 10000)
    assert set(got) == set(want)
    assert len(got) == len(want)


def test_spatial_hash_is_linear_at_1000_tiles():
    """1024 chain positions: proposal must finish instantly (the old double
    loop did 500k tests)."""
    import time
    grid = 32
    pos = []
    for r in range(grid):
        cols = range(grid) if r % 2 == 0 else range(grid - 1, -1, -1)
        pos.extend((72.0 * r, 96.0 * c) for c in cols)
    t0 = time.perf_counter()
    edges = loop_closure.propose_edges(np.asarray(pos), (96, 128), 0.04,
                                       100000)
    dt = time.perf_counter() - t0
    assert len(edges) >= 2 * grid * (grid - 1) - 100  # row + diag neighbors
    assert dt < 2.0, f"spatial hash took {dt:.2f}s"


def test_stretch_pipeline_small_grid():
    """Full distributed flow on a 6x6 grid: sharded registration ->
    loop closure -> distributed solve -> sharded compose; the solve must
    beat the chain (the reference's prefix-sum drift)."""
    rep = stretch.run(grid=6)
    n = rep.n_tiles
    assert n == 36
    assert rep.registered_ok >= n - 2
    assert rep.loop_edges > 2 * 6
    assert rep.solved_rmse_px <= rep.chain_rmse_px + 1e-6
    assert rep.solved_rmse_px < 1.0
    assert rep.canvas_shape[0] > 0
