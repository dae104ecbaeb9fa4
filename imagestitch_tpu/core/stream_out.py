"""Bandwidth-optimal panorama output: device compute, delta-only readback.

The reference writes its panorama with one full host-side canvas pass
(reference: Stitcher.py:440-486).  Our device composer keeps the canvas in
HBM; materializing it on the host costs one full-panorama D2H transfer —
the dominant end-to-end phase on thin host<->device links (this
environment's tunnel moves ~10-33 MB/s; even real PCIe is ~100x slower
than HBM).

Observation: after composition, every canvas pixel's LAST writer is either
  (a) a plain image paste — which the host can replay exactly, for free,
      from the decoded frames it already owns, or
  (b) a fused overlap-rect write — confined to the union of the per-pair
      fusion rects (a small fraction of the panorama: consecutive-pair
      overlaps only, reference Stitcher.py:457-469).
So the host reconstruction "paste all frames in placement order, then copy
the FINAL canvas content of every fusion rect" is pixel-exact, and only the
rects ever cross the link (~35 MB vs ~94 MB for the dendritic gray
panorama).  Rect reads happen as ONE jitted static-slice gather into a flat
buffer -> one contiguous readback.

Color goes further: the reference registers on grayscale and only loads
color at composition (Stitcher.py:68-69, :381-384), so shipping the color
batch to the device (3x the gray bytes) JUST to blend ~10% of its pixels is
pure waste.  ``compose_color_host`` replays the paste sequence on a host
canvas and evaluates each fusion rect with the SAME jax fusion kernels
(ops/fusion/blend.py) pinned to the CPU backend — elementwise math is
bit-identical across XLA backends, so the result equals the device color
composer's (asserted in tests/test_stream_out.py) with ZERO color bytes
crossing the link in either direction.

The full-readback path (core/compose.py + utils/transfer.read_back) remains
the default where the panorama's consumer is the device itself or the link
is fast; the CLI exposes ``--stream-output``.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StitchConfig
from ..ops.fusion import blend
from . import compose as compose_mod


def fuse_rects_of_steps(steps) -> Tuple[Tuple[int, int, int, int], ...]:
    """Static (rr, rc, rh, rw) tuples of every fuse step, in step order."""
    return tuple((s[3][0], s[3][1], s[4][0], s[4][1])
                 for s in steps if s[0] == "fuse")


@functools.partial(jax.jit, static_argnames=("rects",))
def _extract_rects_flat(canvas: jnp.ndarray,
                        rects: Tuple[Tuple[int, int, int, int], ...]
                        ) -> jnp.ndarray:
    """Concatenate the canvas content of every rect into one flat vector.

    Static-coordinate slices (placement is host-known), so XLA lowers this
    to plain copies; the single output crosses the link as one contiguous
    stream instead of K small transfers.
    """
    tail = canvas.shape[2:]
    parts = []
    for rr, rc, rh, rw in rects:
        sl = jax.lax.slice(canvas, (rr, rc) + (0,) * len(tail),
                           (rr + rh, rc + rw) + tail)
        parts.append(sl.reshape(-1))
    if not parts:
        return jnp.zeros((0,), canvas.dtype)
    return jnp.concatenate(parts)


def _paste_host(canvas: np.ndarray, img: np.ndarray, r: int, c: int) -> None:
    """Host paste; row-wise memcpy via the native runtime when available."""
    from ..io import native_loader
    lib = native_loader.get_lib()
    h, w = img.shape[:2]
    ch = img.shape[2] if img.ndim == 3 else 1
    if lib is not None and canvas.flags.c_contiguous and \
            img.flags.c_contiguous and canvas.dtype == np.uint8 \
            and img.dtype == np.uint8:
        import ctypes
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.isr_paste(canvas.ctypes.data_as(u8p), canvas.shape[0],
                      canvas.shape[1], ch, img.ctypes.data_as(u8p),
                      h, w, int(r), int(c))
    else:
        canvas[r:r + h, c:c + w] = img


def assemble_host(frames: np.ndarray, placement, steps,
                  rect_stream: np.ndarray) -> np.ndarray:
    """Paste frames in placement order, then patch in the streamed rects."""
    rows, cols = placement.canvas_shape
    ch = frames.shape[3] if frames.ndim == 4 else 1
    shape = (rows, cols, ch) if frames.ndim == 4 else (rows, cols)
    canvas = np.zeros(shape, np.uint8)
    for s in steps:
        i, (r, c) = s[1], s[2]
        _paste_host(canvas, frames[i], r, c)
    off = 0
    for rr, rc, rh, rw in fuse_rects_of_steps(steps):
        size = rh * rw * ch
        canvas[rr:rr + rh, rc:rc + rw] = \
            rect_stream[off:off + size].reshape((rh, rw, ch) if ch > 1
                                                else (rh, rw))
        off += size
    return canvas


def compose_streamed(frames_host: np.ndarray,
                     offsets: Sequence[Tuple[int, int]],
                     cfg: StitchConfig,
                     frames_dev: Optional[jnp.ndarray] = None,
                     return_device: bool = False):
    """Device-composed panorama, host-materialized via rect-only readback.

    ``frames_host``: (N, H, W[, 3]) uint8 decoded frames (the host owns
    these anyway — they are the decode output).  ``frames_dev``: the same
    batch already in HBM, if the caller has it (registration just used it).
    Returns the host uint8 panorama; with ``return_device`` also the
    HBM-resident canvas.
    """
    from ..utils.transfer import read_back
    h, w = frames_host.shape[1], frames_host.shape[2]
    placement, steps, _ = compose_mod.plan_compose(offsets, (h, w), cfg)
    src = frames_dev if frames_dev is not None else frames_host
    pano_dev = compose_mod.compose(src, offsets, cfg, return_device=True)
    rects = fuse_rects_of_steps(steps)
    stream = read_back(_extract_rects_flat(pano_dev, rects))
    out = assemble_host(frames_host, placement, steps, stream)
    if return_device:
        return out, pano_dev
    return out


# --------------------------------------------------------------------------
# Host color composition (no color bytes cross the link)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("bh", "bw", "method", "color"))
def _fuse_padded_jit(roi_a: jnp.ndarray, roi_b: jnp.ndarray,
                     drow, dcol, orow, ocol, rh, rw,
                     bh: int, bw: int, method: str, color: bool):
    del bh, bw  # shape-keyed compilation only
    return blend.fuse_region_padded(roi_a, roi_b, drow, dcol,
                                    orow, ocol, rh, rw, method, color)


def compose_color_host(frames_color: np.ndarray,
                       offsets: Sequence[Tuple[int, int]],
                       cfg: StitchConfig) -> np.ndarray:
    """Color panorama computed host-side with the device fusion kernels.

    Replays the exact paste/fuse step sequence of the device composer
    (plan_compose + plan_groups bucket normalization) on a host int16
    canvas; each fusion rect runs ``blend.fuse_region_padded`` — the same
    code the device scan calls — jitted on the CPU backend.  Elementwise
    XLA math is backend-bit-identical, so the output equals
    ``compose(frames_color, ...)`` without the (3x-gray) color upload or
    the full-panorama readback.
    """
    assert frames_color.ndim == 4, "color batch expected"
    assert cfg.fuse_method in compose_mod._PADDABLE_METHODS, \
        f"{cfg.fuse_method} is gray-only (ref parity)"
    n, h, w = frames_color.shape[:3]
    placement, steps, pairwise = compose_mod.plan_compose(
        offsets, (h, w), cfg)
    rows, cols = placement.canvas_shape
    canvas = np.full((rows, cols, 3), -1, np.int16)
    groups = compose_mod.plan_groups(steps, cfg.fuse_method, rows, cols)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        for kind, rect_shape, idxs, pos, aux, geoms in groups:
            if kind == "paste":
                for i, (r, c) in zip(idxs, pos):
                    canvas[r:r + h, c:c + w] = frames_color[i]
                continue
            assert kind == "fusep"
            bh, bw = rect_shape
            for i, (r, c), (ar, ac), g in zip(idxs, pos, aux, geoms):
                roi_a = canvas[ar:ar + bh, ac:ac + bw].astype(np.int32)
                canvas[r:r + h, c:c + w] = frames_color[i]
                roi_b = canvas[ar:ar + bh, ac:ac + bw].astype(np.int32)
                pw = pairwise[i]
                fused = _fuse_padded_jit(
                    roi_a, roi_b,
                    jnp.int32(pw[0]), jnp.int32(pw[1]),
                    jnp.int32(g[0]), jnp.int32(g[1]),
                    jnp.int32(g[2]), jnp.int32(g[3]),
                    bh, bw, cfg.fuse_method, True)
                canvas[ar:ar + bh, ac:ac + bw] = \
                    np.asarray(fused).astype(np.int16)
    return np.where(canvas == -1, 0, canvas).astype(np.uint8)
