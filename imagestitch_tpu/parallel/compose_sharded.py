"""Sharded canvas composition (multi-chip).

The reference materializes one monolithic canvas and fuses serially
(reference: Stitcher.py:433-483).  For pods, the canvas here is partitioned
into row blocks across the mesh (the stitching analog of context/sequence
parallelism, SURVEY §2.3): every device owns a (R/D, C) block resident in its
HBM and applies each paste locally — no communication.  A fusion rect that
crosses block boundaries is assembled with a ``psum`` halo exchange (each
device contributes its masked slice; blocks partition rows so the sum IS the
gather), the blend math runs replicated (rects are strip-sized), and each
device writes back only its rows.

Semantics identical to core/compose.compose — verified bit-exact on the
virtual 8-device CPU mesh in tests.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import StitchConfig
from ..core.compose import compute_placement
from ..ops.fusion import blend


def _block_window(padded_rows: jnp.ndarray, start_row, n_rows: int):
    """Fixed-size row window of a row-padded array (pad = n_rows each side)."""
    return jax.lax.dynamic_slice_in_dim(padded_rows, start_row + n_rows,
                                        n_rows, axis=0)


def _compose_step(canvas_local, image, r, c, rect, fuse: bool,
                  drow, dcol, method: str, color: bool, axis: str,
                  block_rows: int):
    """One image's paste (+ optional rect fusion) on the local block.

    canvas_local: (Rb, C[, 3]) int16; image: (h, w[, 3]) uint8 (replicated);
    r, c: global paste position; rect: (rr0, rc0) with static (rh, rw) from
    the caller's specialization.
    """
    my0 = jax.lax.axis_index(axis) * block_rows
    rb = canvas_local.shape[0]
    cw = canvas_local.shape[1]
    h, w = image.shape[0], image.shape[1]
    chan = canvas_local.shape[2:]

    def local_rows_mask(g0, n):
        """(Rb, 1[,1]) bool: local rows whose global index is in [g0, g0+n)."""
        gr = my0 + jnp.arange(rb)
        m = (gr >= g0) & (gr < g0 + n)
        return m.reshape((rb, 1) + (1,) * len(chan))

    def place(img, g0, c0, n_valid_rows, img_h):
        """Scatter img (img_h, w', ...) at global (g0, c0) into a local-block
        -sized buffer, rows outside the block masked invalid."""
        pad_spec = ((rb, rb), (0, 0)) + ((0, 0),) * len(chan)
        padded = jnp.pad(img, pad_spec)
        win = _block_window(padded, my0 - g0, rb)  # (rb, w', ...)
        buf = jnp.zeros((rb, cw) + chan, img.dtype)
        buf = jax.lax.dynamic_update_slice(
            buf, win, (0, c0) + (0,) * len(chan))
        return buf, local_rows_mask(g0, n_valid_rows)

    # ---- paste image at (r, c) -------------------------------------------
    buf, m = place(image.astype(canvas_local.dtype), r, c, h, h)
    col_ok = (jnp.arange(cw) >= c) & (jnp.arange(cw) < c + w)
    col_ok = col_ok.reshape((1, cw) + (1,) * len(chan))
    paste_mask = m & col_ok
    before = canvas_local
    canvas_local = jnp.where(paste_mask, buf, canvas_local)

    if not fuse:
        return canvas_local

    rr0, rc0 = rect
    rh, rw = _compose_step.rect_shape  # static, bound by the caller

    def gather_rect(local_canvas):
        pad_spec = ((rh, rh), (0, 0)) + ((0, 0),) * len(chan)
        padded = jnp.pad(local_canvas, pad_spec)
        win = jax.lax.dynamic_slice(
            padded, (rr0 - my0 + rh, rc0) + (0,) * len(chan),
            (rh, local_canvas.shape[1] - 0) if False else
            (rh, rw) + chan)
        gr = rr0 + jnp.arange(rh)
        mine = ((gr >= my0) & (gr < my0 + rb)).reshape(
            (rh, 1) + (1,) * len(chan))
        contrib = jnp.where(mine, win.astype(jnp.int32), 0)
        return jax.lax.psum(contrib, axis)

    roi_a = gather_rect(before)
    roi_b = gather_rect(canvas_local)
    fused = blend.fuse_region(roi_a, roi_b, drow, dcol, method, color)

    # write back my rows of the fused rect
    fbuf, fmask = place(fused.astype(canvas_local.dtype), rr0, rc0, rh, rh)
    fcol = (jnp.arange(cw) >= rc0) & (jnp.arange(cw) < rc0 + rw)
    fcol = fcol.reshape((1, cw) + (1,) * len(chan))
    return jnp.where(fmask & fcol, fbuf, canvas_local)


def compose_sharded(images: np.ndarray, offsets: Sequence[Tuple[int, int]],
                    cfg: StitchConfig, mesh: Mesh) -> np.ndarray:
    """Sharded-canvas equivalent of core/compose.compose."""
    n = images.shape[0]
    color = images.ndim == 4
    h, w = images.shape[1], images.shape[2]
    placement = compute_placement(offsets, (h, w))
    rows, cols = placement.canvas_shape
    d = mesh.devices.size
    axis = mesh.axis_names[0]
    block_rows = -(-rows // d)
    rows_p = block_rows * d
    chan = (3,) if color else ()

    canvas = jnp.full((rows_p, cols) + chan, -1, jnp.int16)
    canvas = jax.device_put(canvas, NamedSharding(mesh, P(axis)))
    pairwise = [(0, 0)] + [tuple(o) for o in offsets]

    step_cache = {}

    def get_step(rect_shape, fuse: bool):
        key = (rect_shape, fuse)
        if key in step_cache:
            return step_cache[key]

        def stepper(canvas_local, image, r, c, rr0, rc0, drow, dcol):
            _compose_step.rect_shape = rect_shape
            return _compose_step(canvas_local, image, r, c, (rr0, rc0), fuse,
                                 drow, dcol, cfg.fuse_method, color, axis,
                                 block_rows)

        sharded = shard_map(
            stepper, mesh=mesh,
            in_specs=(P(axis), P(), P(), P(), P(), P(), P(), P()),
            out_specs=P(axis), check_vma=False)
        fn = jax.jit(sharded, donate_argnums=(0,))
        step_cache[key] = fn
        return fn

    images_dev = jax.device_put(np.asarray(images),
                                NamedSharding(mesh, P()))
    zero = jnp.int32(0)
    for i in range(n):
        r, c = placement.positions[i]
        img = images_dev[i]
        fuse = (i > 0 and cfg.fuse_method != "notFuse")
        if fuse:
            rr0 = max(r, placement.range_rows[i - 1][0])
            rc0 = max(c, placement.range_cols[i - 1][0])
            rr1 = min(r + h, placement.range_rows[i - 1][1])
            rc1 = min(c + w, placement.range_cols[i - 1][1])
            if rr1 - rr0 <= 0 or rc1 - rc0 <= 0:
                fuse = False
        if fuse:
            drow, dcol = pairwise[i]
            fn = get_step((rr1 - rr0, rc1 - rc0), True)
            canvas = fn(canvas, img, jnp.int32(r), jnp.int32(c),
                        jnp.int32(rr0), jnp.int32(rc0),
                        jnp.int32(drow), jnp.int32(dcol))
        else:
            fn = get_step((1, 1), False)
            canvas = fn(canvas, img, jnp.int32(r), jnp.int32(c),
                        zero, zero, zero, zero)
    out = np.asarray(jnp.where(canvas == -1, 0, canvas).astype(jnp.uint8))
    return out[:rows]
