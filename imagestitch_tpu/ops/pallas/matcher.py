"""Pallas TPU kernel: fused all-pairs distance + top-2 matcher.

The XLA path (ops/features/match.py) materializes the (K, K) distance matrix
in HBM per pair — at K=2048 that is 16 MB of HBM traffic per pair batch
element, written and immediately re-read by the top-2 reduction.  This kernel
keeps each (TILE_A, K) distance tile in VMEM: one MXU contraction per query
tile against the whole (K, D) descriptor set (which fits VMEM comfortably at
K<=4096, D<=128), followed by an in-register row top-2 — HBM sees only the
(K,) outputs.

Semantics identical to match._top2_min on the masked distance matrix;
validated against the XLA path in tests (interpret mode on CPU).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.4e38
_TILE_A = 256


def _matcher_kernel(da_ref, db_ref, nb_ref, vb_ref, d0_ref, i0_ref, d1_ref):
    a = da_ref[:]                                   # (TA, D)
    b = db_ref[:]                                   # (K, D)
    ab = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TA, K) on the MXU
    na = jnp.sum(a * a, axis=1, keepdims=True)       # (TA, 1)
    dist = jnp.maximum(na + nb_ref[:] - 2.0 * ab, 0.0)
    dist = jnp.where(vb_ref[:] > 0, dist, _BIG)      # mask invalid train rows
    d0 = jnp.min(dist, axis=1)
    i0 = jnp.argmin(dist, axis=1).astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    dist2 = jnp.where(col == i0[:, None], _BIG, dist)
    d1 = jnp.min(dist2, axis=1)
    d0_ref[:] = d0[None, :]
    i0_ref[:] = i0[None, :]
    d1_ref[:] = d1[None, :]


def _matcher_coords_kernel(da_ref, db_ref, nb_ref, vb_ref, rb_ref, cb_ref,
                           d0_ref, i0_ref, d1_ref, rb_sel_ref, cb_sel_ref):
    """top-2 matcher that ALSO extracts the matched train keypoint's
    coordinates in-kernel via masked lane reductions over the VMEM-resident
    distance tile — the downstream vote otherwise pays ~131k scalar gathers
    per attempt for ``rows_b[train_idx]`` (measured r4: TPU per-element
    gathers dominate the vote cost)."""
    a = da_ref[:]
    b = db_ref[:]
    ab = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    na = jnp.sum(a * a, axis=1, keepdims=True)
    dist = jnp.maximum(na + nb_ref[:] - 2.0 * ab, 0.0)
    dist = jnp.where(vb_ref[:] > 0, dist, _BIG)
    d0 = jnp.min(dist, axis=1)
    i0 = jnp.argmin(dist, axis=1).astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    onehot = col == i0[:, None]
    dist2 = jnp.where(onehot, _BIG, dist)
    d1 = jnp.min(dist2, axis=1)
    rb_sel = jnp.sum(jnp.where(onehot, rb_ref[:], 0.0), axis=1)
    cb_sel = jnp.sum(jnp.where(onehot, cb_ref[:], 0.0), axis=1)
    d0_ref[:] = d0[None, :]
    i0_ref[:] = i0[None, :]
    d1_ref[:] = d1[None, :]
    rb_sel_ref[:] = rb_sel[None, :]
    cb_sel_ref[:] = cb_sel[None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def top2_l2(da: jnp.ndarray, db: jnp.ndarray, valid_b: jnp.ndarray,
            interpret: bool = False
            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(Ka, D) x (Kb, D) -> (d0, i0, d1) squared-L2 top-2 per query row.

    Ka must be a multiple of the 256-row tile (pad queries with zeros and
    mask downstream).  ``interpret=True`` runs the kernel in interpreter
    mode (CPU testing).
    """
    ka, d = da.shape
    kb = db.shape[0]
    assert ka % _TILE_A == 0, f"Ka={ka} must be a multiple of {_TILE_A}"
    nb = jnp.sum(db * db, axis=1)[None, :]           # (1, Kb)
    vb = valid_b.astype(jnp.float32)[None, :]        # (1, Kb)
    grid = (ka // _TILE_A,)
    d0, i0, d1 = pl.pallas_call(
        _matcher_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_A, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _TILE_A), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_A), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_A), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, ka), jnp.float32),
            jax.ShapeDtypeStruct((1, ka), jnp.int32),
            jax.ShapeDtypeStruct((1, ka), jnp.float32),
        ],
        interpret=interpret,
    )(da, db, nb, vb)
    return d0[0], i0[0], d1[0]


def match_ratio_pallas(da: jnp.ndarray, db: jnp.ndarray,
                       valid_a: jnp.ndarray, valid_b: jnp.ndarray,
                       ratio: float, interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for match.match_ratio using the fused kernel."""
    d0, i0, d1 = top2_l2(da, db, valid_b, interpret=interpret)
    ok = valid_a & (d0 < (ratio * ratio) * d1) & (d1 < _BIG)
    return i0, ok


@functools.partial(jax.jit, static_argnames=("interpret",))
def top2_l2_coords(da: jnp.ndarray, db: jnp.ndarray, valid_b: jnp.ndarray,
                   rows_b: jnp.ndarray, cols_b: jnp.ndarray,
                   interpret: bool = False):
    """top2_l2 + in-kernel matched-coordinate extraction.

    Returns (d0, i0, d1, rb_sel, cb_sel); rb_sel/cb_sel are rows_b/cols_b
    at each query's best match (garbage where no valid train row exists —
    callers gate on the ratio-test validity)."""
    ka, d = da.shape
    kb = db.shape[0]
    assert ka % _TILE_A == 0, f"Ka={ka} must be a multiple of {_TILE_A}"
    nb = jnp.sum(db * db, axis=1)[None, :]
    vb = valid_b.astype(jnp.float32)[None, :]
    grid = (ka // _TILE_A,)
    row_out = lambda: pl.BlockSpec((1, _TILE_A), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    full_in = lambda: pl.BlockSpec((1, kb), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    d0, i0, d1, rb_sel, cb_sel = pl.pallas_call(
        _matcher_coords_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_A, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            full_in(), full_in(), full_in(), full_in(),
        ],
        out_specs=[row_out() for _ in range(5)],
        out_shape=[
            jax.ShapeDtypeStruct((1, ka), jnp.float32),
            jax.ShapeDtypeStruct((1, ka), jnp.int32),
            jax.ShapeDtypeStruct((1, ka), jnp.float32),
            jax.ShapeDtypeStruct((1, ka), jnp.float32),
            jax.ShapeDtypeStruct((1, ka), jnp.float32),
        ],
        interpret=interpret,
    )(da, db, nb, vb, rows_b[None, :], cols_b[None, :])
    return d0[0], i0[0], d1[0], rb_sel[0], cb_sel[0]


def match_ratio_pallas_coords(da, db, valid_a, valid_b, rows_b, cols_b,
                              ratio: float, interpret: bool = False):
    """match_ratio_pallas + matched train coordinates (no host gathers)."""
    d0, i0, d1, rb_sel, cb_sel = top2_l2_coords(da, db, valid_b, rows_b,
                                                cols_b, interpret=interpret)
    ok = valid_a & (d0 < (ratio * ratio) * d1) & (d1 < _BIG)
    return i0, ok, rb_sel, cb_sel
