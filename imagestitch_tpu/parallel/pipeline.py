"""Sharded batched execution steps.

The multi-chip execution path (SURVEY §2.3): adjacent-pair registration is
data-parallel over a ``pairs`` mesh axis — pair tensors are placed with a
``NamedSharding`` and the vmapped FFT pipeline auto-partitions (XLA inserts
no cross-device communication for the batched FFT; the only collective is the
pose-graph solve's psum).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import phase_corr, roi
from ..solver import pose_graph as pg
from .mesh import pad_to_multiple


def make_pair_tensors(images: np.ndarray, mesh: Optional[Mesh] = None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """(N,H,W) batch -> sharded (P,H,W) A/B pair tensors (P padded to mesh).

    Returns (a, b, n_pairs_valid).  Padding replicates the last pair; callers
    slice results back to ``n_pairs_valid``.
    """
    a_np = images[:-1]
    b_np = images[1:]
    n_pairs = a_np.shape[0]
    if mesh is None:
        return jnp.asarray(a_np), jnp.asarray(b_np), n_pairs
    d = mesh.devices.size
    p_pad = pad_to_multiple(max(n_pairs, d), d)
    if p_pad != n_pairs:
        reps = np.repeat(a_np[-1:], p_pad - n_pairs, axis=0)
        a_np = np.concatenate([a_np, reps])
        b_np = np.concatenate([b_np, np.repeat(b_np[-1:], p_pad - n_pairs, 0)])
    shard = NamedSharding(mesh, P(mesh.axis_names[0]))
    return (jax.device_put(a_np, shard), jax.device_put(b_np, shard), n_pairs)


@functools.partial(jax.jit, static_argnames=("direction", "ratio", "hp", "wp"))
def _register_pairs_jit(a: jnp.ndarray, b: jnp.ndarray, direction: int,
                        ratio: float, hp: int, wp: int):
    ra, rb = roi.extract_strips(a, b, direction, ratio)
    f = jax.vmap(lambda x, y: phase_corr._phase_correlate_one(
        x.astype(jnp.float32), y.astype(jnp.float32), hp, wp))
    return f(ra, rb)


def register_pairs_sharded(a: jnp.ndarray, b: jnp.ndarray, direction: int,
                           ratio: float):
    """Batched phase registration over (possibly sharded) pair tensors."""
    h, w = a.shape[-2], a.shape[-1]
    if direction in (1, 3):
        sh, sw = roi.strip_length(h, ratio), w
    else:
        sh, sw = h, roi.strip_length(w, ratio)
    hp, wp = phase_corr.optimal_dft_size(sh), phase_corr.optimal_dft_size(sw)
    return _register_pairs_jit(a, b, direction, ratio, hp, wp)


def distributed_stitch_step(images: np.ndarray, mesh: Mesh,
                            direction: int = 1, ratio: float = 0.25,
                            cg_iters: int = 64) -> np.ndarray:
    """One full distributed pipeline step: sharded registration -> global
    pose solve with psum over the mesh.  Returns absolute (N, 2) poses.

    This is the multi-chip 'training step' analog validated by
    ``__graft_entry__.dryrun_multichip``.
    """
    a, b, n_pairs = make_pair_tensors(images, mesh)
    sx, sy, resp = register_pairs_sharded(a, b, direction, ratio)
    sx = np.asarray(sx)[:n_pairs]
    sy = np.asarray(sy)[:n_pairs]
    resp = np.asarray(resp)[:n_pairs]
    h, _ = images.shape[1], images.shape[2]
    mr, mc = roi.margin_correction(direction, images.shape[1:3],
                                   images.shape[1:3], ratio)
    # cv2-style (x, y) is minus the displacement: strip offset = (-y, -x)
    offsets = np.stack([-sy + mr, -sx + mc], axis=1)
    graph = pg.PoseGraph.from_chain(
        [tuple(o) for o in offsets], np.maximum(resp, 1e-3))
    return pg.solve(graph, iters=cg_iters, mesh=mesh)
