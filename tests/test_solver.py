"""Pose-graph solver: correctness + sharded (8-device) parity."""
import numpy as np
import pytest

import jax

from imagestitch_tpu.solver import pose_graph
from imagestitch_tpu.parallel.mesh import make_mesh


def test_chain_recovers_prefix_sum():
    offsets = [(100.0, 2.0), (98.0, -1.0), (-10.0, 240.0)]
    g = pose_graph.PoseGraph.from_chain(offsets)
    x = pose_graph.solve(g)
    np.testing.assert_allclose(x, pose_graph.chain_positions(offsets),
                               atol=1e-3)


def test_grid_loop_closure_beats_chain():
    """A noisy 2D grid with redundant edges: LS beats the drifting chain."""
    rng = np.random.default_rng(7)
    gh, gw = 6, 8
    spacing = np.array([100.0, 120.0])
    truth = np.array([[i * spacing[0], j * spacing[1]]
                      for i in range(gh) for j in range(gw)])
    node = lambda i, j: i * gw + j
    ea, eb, m = [], [], []
    for i in range(gh):
        for j in range(gw):
            if j + 1 < gw:
                ea.append(node(i, j)); eb.append(node(i, j + 1))
                m.append([0.0, spacing[1]])
            if i + 1 < gh:
                ea.append(node(i, j)); eb.append(node(i + 1, j))
                m.append([spacing[0], 0.0])
    m = np.asarray(m) + rng.normal(0, 1.0, (len(m), 2))
    g = pose_graph.PoseGraph(
        edges_a=np.asarray(ea, np.int32), edges_b=np.asarray(eb, np.int32),
        measurements=m.astype(np.float32),
        weights=np.ones(len(ea), np.float32), n_nodes=gh * gw)
    x = pose_graph.solve(g, iters=500)
    err = np.abs((x - x[0]) - (truth - truth[0])).mean()
    # drifting chain baseline: first-row then first-col path per node
    chain_err = []
    pos = np.zeros((gh * gw, 2))
    meas = {(a, b): mm for a, b, mm in zip(ea, eb, m)}
    for i in range(gh):
        for j in range(gw):
            if i == 0 and j == 0:
                continue
            if j > 0:
                pos[node(i, j)] = pos[node(i, j - 1)] + meas[(node(i, j - 1),
                                                              node(i, j))]
            else:
                pos[node(i, 0)] = pos[node(i - 1, 0)] + meas[(node(i - 1, 0),
                                                              node(i, 0))]
    chain_err = np.abs(pos - truth).mean()
    assert err < 1.5
    assert err < chain_err  # LS averages the noise; the chain drifts


def test_sharded_solver_matches_single_device(rng):
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    offsets = [(float(rng.integers(90, 110)), float(rng.integers(-3, 3)))
               for _ in range(23)]
    conf = rng.uniform(0.5, 1.0, len(offsets))
    g = pose_graph.PoseGraph.from_chain(offsets, conf)
    x1 = pose_graph.solve(g, iters=200)
    mesh = make_mesh(8)
    x8 = pose_graph.solve(g, iters=200, mesh=mesh)
    np.testing.assert_allclose(x8, x1, atol=1e-2)


def test_weight_zero_edge_ignored():
    offsets = [(10.0, 0.0), (10.0, 0.0)]
    g = pose_graph.PoseGraph.from_chain(offsets)
    # an absurd zero-weight extra edge must not affect the solution
    g2 = g.with_extra_edges([0], [2], [[999.0, 999.0]], [0.0])
    x = pose_graph.solve(g2)
    np.testing.assert_allclose(x, pose_graph.chain_positions(offsets), atol=1e-3)
