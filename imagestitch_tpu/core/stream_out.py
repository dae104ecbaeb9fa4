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
batch to the device (3x the gray bytes) JUST to blend a fraction of its
pixels is pure waste.  ``compose_color_host`` replays the paste sequence
on a host canvas and evaluates each fusion rect with the float64 numpy
kernels (ops/fusion/host_blend.py) — the REFERENCE's own arithmetic
(ImageFusion.py:241-243 promotes through float64), with ZERO color bytes
crossing the link in either direction.  The device f32 composer agrees to
±1 LSB on ~5e-5 of blended pixels (measured on TPU, asserted bounded in
tests/test_stream_out.py).

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


def paste_all_host(frames: np.ndarray, placement, steps) -> np.ndarray:
    """Replay the paste sequence on a zeroed host canvas."""
    rows, cols = placement.canvas_shape
    ch = frames.shape[3] if frames.ndim == 4 else 1
    shape = (rows, cols, ch) if frames.ndim == 4 else (rows, cols)
    canvas = np.zeros(shape, np.uint8)
    for s in steps:
        i, (r, c) = s[1], s[2]
        _paste_host(canvas, frames[i], r, c)
    return canvas


def patch_rects_host(canvas: np.ndarray, steps, rect_stream: np.ndarray
                     ) -> np.ndarray:
    """Write the streamed fused-rect contents into the pasted canvas."""
    ch = canvas.shape[2] if canvas.ndim == 3 else 1
    off = 0
    for rr, rc, rh, rw in fuse_rects_of_steps(steps):
        size = rh * rw * ch
        canvas[rr:rr + rh, rc:rc + rw] = \
            rect_stream[off:off + size].reshape((rh, rw, ch) if ch > 1
                                                else (rh, rw))
        off += size
    return canvas


def assemble_host(frames: np.ndarray, placement, steps,
                  rect_stream: np.ndarray) -> np.ndarray:
    """Paste frames in placement order, then patch in the streamed rects."""
    return patch_rects_host(paste_all_host(frames, placement, steps),
                            steps, rect_stream)


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
    from concurrent.futures import ThreadPoolExecutor

    from ..utils.transfer import read_back
    h, w = frames_host.shape[1], frames_host.shape[2]
    placement, steps, _ = compose_mod.plan_compose(offsets, (h, w), cfg)
    src = frames_dev if frames_dev is not None else frames_host
    pano_dev = compose_mod.compose(src, offsets, cfg, return_device=True)
    rects = fuse_rects_of_steps(steps)
    flat = _extract_rects_flat(pano_dev, rects)
    # the host paste replay touches only host memory — run it concurrently
    # with the rect-stream D2H readback
    with ThreadPoolExecutor(max_workers=1) as ex:
        paste_fut = ex.submit(paste_all_host, frames_host, placement, steps)
        stream = read_back(flat)
        canvas = paste_fut.result()
    out = patch_rects_host(canvas, steps, stream)
    if return_device:
        return out, pano_dev
    return out


# --------------------------------------------------------------------------
# Host color composition (no color bytes cross the link)
# --------------------------------------------------------------------------

def compose_color_host(frames_color: np.ndarray,
                       offsets: Sequence[Tuple[int, int]],
                       cfg: StitchConfig) -> np.ndarray:
    """Color panorama computed host-side in the REFERENCE's float64.

    Replays the exact paste/fuse step sequence of the device composer on a
    host int16 canvas; each fusion rect runs the float64 numpy kernels
    (ops/fusion/host_blend.py) — the reference's own arithmetic
    (ImageFusion.py:241-243 promotes through float64, where the device
    kernels run f32 with a documented ±1-LSB divergence on ~5e-5 of
    blended pixels).  Zero color bytes cross the host<->device link in
    either direction.
    """
    from ..ops.fusion import host_blend
    assert frames_color.ndim == 4, "color batch expected"
    assert cfg.fuse_method in compose_mod._PADDABLE_METHODS, \
        f"{cfg.fuse_method} is gray-only (ref parity)"
    n, h, w = frames_color.shape[:3]
    placement, steps, pairwise = compose_mod.plan_compose(
        offsets, (h, w), cfg)
    rows, cols = placement.canvas_shape
    canvas = np.full((rows, cols, 3), -1, np.int16)
    for s in steps:
        kind, i, (r, c) = s[0], s[1], s[2]
        if kind == "paste":
            canvas[r:r + h, c:c + w] = frames_color[i]
            continue
        (rr0, rc0), (rh, rw) = s[3], s[4]
        roi_a = canvas[rr0:rr0 + rh, rc0:rc0 + rw].astype(np.int32)
        canvas[r:r + h, c:c + w] = frames_color[i]
        roi_b = canvas[rr0:rr0 + rh, rc0:rc0 + rw].astype(np.int32)
        pw = pairwise[i]
        fused = host_blend.fuse_region_np(roi_a, roi_b, pw[0], pw[1],
                                          cfg.fuse_method, True)
        canvas[rr0:rr0 + rh, rc0:rc0 + rw] = fused.astype(np.int16)
    return np.where(canvas == -1, 0, canvas).astype(np.uint8)
