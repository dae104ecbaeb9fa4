"""Batched local descriptors at fixed capacity.

TPU-native analogs of the reference's descriptor families
(reference: ImageUtility.py:255-264 SIFT/SURF/ORB via OpenCV;
appendix/myGpuFeatures.cpp:77-118 CUDA):

  * "surf"  — 64-d Haar-gradient subregion sums (SURF, upright)
  * "surf-extended" / "sift" — 128-d sign-split / orientation-binned variants
  * "orb"   — 256-bit BRIEF-style intensity comparisons (Hamming metric)

All are computed as one vectorized gather + einsum over a (K, S, S) sample
grid per image — no per-keypoint host loops, fully batched over (P, K).
Keypoint orientation is fixed upright (micrograph stages translate, they do
not rotate; reference surfIsUpright knob at ImageUtility.py:28).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_S = 16          # sample grid edge (SxS window)
_SUB = 4         # 4x4 subregions
_ORB_BITS = 256
_ORB_PATCH = 15  # +-15 -> 31x31 patch (ImageUtility.py:37 orbPatchSize)


def _gauss_weight(s: int, sigma: float) -> np.ndarray:
    ax = np.arange(s, dtype=np.float64) - (s - 1) / 2.0
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    w = np.outer(g, g)
    return (w / w.sum()).astype(np.float32)


def _sample_grid(image: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray,
                 offsets: np.ndarray) -> jnp.ndarray:
    """Gather image values on a fixed offset grid around each keypoint.

    image: (H, W); rows/cols: (K,); offsets: (G,) relative int offsets.
    Returns (K, G, G) with clipped (replicated-edge) sampling.

    A single flat 1-D ``take`` lowers to one linear gather — ~2x faster on
    TPU than the equivalent 2-D advanced-indexing gather.
    """
    h, w = image.shape
    off = jnp.asarray(offsets, jnp.int32)
    r = jnp.clip(rows.astype(jnp.int32)[:, None] + off[None, :], 0, h - 1)
    c = jnp.clip(cols.astype(jnp.int32)[:, None] + off[None, :], 0, w - 1)
    k, g = r.shape
    idx = (r[:, :, None] * w + c[:, None, :]).reshape(-1)
    return jnp.take(image.reshape(-1), idx).reshape(k, g, g)


def _surf_from_grads(gx: jnp.ndarray, gy: jnp.ndarray, extended: bool
                     ) -> jnp.ndarray:
    """(K, S, S) gradients -> (K, 64|128) SURF vector."""
    k = gx.shape[0]
    sub = _S // _SUB
    gxs = gx.reshape(k, _SUB, sub, _SUB, sub)
    gys = gy.reshape(k, _SUB, sub, _SUB, sub)
    if not extended:
        feats = jnp.stack([
            gxs.sum((2, 4)), gys.sum((2, 4)),
            jnp.abs(gxs).sum((2, 4)), jnp.abs(gys).sum((2, 4)),
        ], axis=-1)                                   # (K, 4, 4, 4)
    else:
        pos_y = (gys >= 0)
        pos_x = (gxs >= 0)
        feats = jnp.stack([
            jnp.where(pos_y, gxs, 0).sum((2, 4)),
            jnp.where(~pos_y, gxs, 0).sum((2, 4)),
            jnp.where(pos_y, jnp.abs(gxs), 0).sum((2, 4)),
            jnp.where(~pos_y, jnp.abs(gxs), 0).sum((2, 4)),
            jnp.where(pos_x, gys, 0).sum((2, 4)),
            jnp.where(~pos_x, gys, 0).sum((2, 4)),
            jnp.where(pos_x, jnp.abs(gys), 0).sum((2, 4)),
            jnp.where(~pos_x, jnp.abs(gys), 0).sum((2, 4)),
        ], axis=-1)                                   # (K, 4, 4, 8)
    d = feats.reshape(k, -1)
    return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)


def _sift_from_grads(gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    """(K, S, S) gradients -> (K, 128) upright SIFT vector (4x4x8 bins)."""
    k = gx.shape[0]
    mag = jnp.sqrt(gx * gx + gy * gy)
    ori = jnp.arctan2(gy, gx)                         # [-pi, pi)
    b = jnp.floor((ori + jnp.pi) / (2 * jnp.pi / 8)).astype(jnp.int32) % 8
    onehot = jax.nn.one_hot(b, 8, dtype=mag.dtype) * mag[..., None]
    sub = _S // _SUB
    hist = onehot.reshape(k, _SUB, sub, _SUB, sub, 8).sum((2, 4))
    d = hist.reshape(k, 128)
    d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)
    d = jnp.minimum(d, 0.2)                           # SIFT clip
    return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)


def _orb_pattern(seed: int = 7) -> Tuple[np.ndarray, np.ndarray]:
    """Fixed BRIEF sampling pattern: 256 point pairs in the 31x31 patch."""
    rng = np.random.default_rng(seed)
    pts = np.clip(rng.normal(0, _ORB_PATCH / 2.5, (_ORB_BITS, 2, 2)),
                  -_ORB_PATCH, _ORB_PATCH).astype(np.int32)
    return pts[:, 0], pts[:, 1]  # (256, 2) each: (dr, dc)


_ORB_P1, _ORB_P2 = _orb_pattern()


def _orb_diff_matrix() -> np.ndarray:
    """(patch_px, 256) matrix D with D[flat(p2_b), b]=+1, D[flat(p1_b), b]=-1:
    ``patch_flat @ D > 0``  ==  ``I(p1) < I(p2)`` — the BRIEF test as one
    MXU contraction over the gathered patches."""
    side = 2 * _ORB_PATCH + 1
    d = np.zeros((side * side, _ORB_BITS), np.float32)
    for b in range(_ORB_BITS):
        r1, c1 = _ORB_P1[b] + _ORB_PATCH
        r2, c2 = _ORB_P2[b] + _ORB_PATCH
        d[r1 * side + c1, b] -= 1.0
        d[r2 * side + c2, b] += 1.0
    return d


def _orb_bits(image: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray,
              smooth: jnp.ndarray) -> jnp.ndarray:
    """(K, 256) float {0,1} BRIEF bits (float form feeds the Hamming matmul).

    One (31, 31) patch-slice gather per keypoint, then the 256 point-pair
    comparisons as a single (K, 961) x (961, 256) matmul against a static
    +-1 difference matrix — no scalar gathers anywhere.
    """
    side = 2 * _ORB_PATCH + 1
    k = rows.shape[0]
    patch = _patch_gather(smooth, rows, cols, side, _ORB_PATCH)
    diffs = jnp.dot(patch.reshape(k, side * side), jnp.asarray(_orb_diff_matrix()),
                    preferred_element_type=jnp.float32)
    return (diffs > 0).astype(jnp.float32)


def _patch_gather(image: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray,
                  size: int, margin: int) -> jnp.ndarray:
    """(K, size, size) windows centered like the descriptor grid.

    One ``lax.gather`` in SLICE mode: each keypoint fetches ``size``
    contiguous row segments instead of size*size scalar elements — TPU
    gathers are transaction-bound, so this is ~10x faster than
    advanced-indexing the same windows.  CLIP mode clamps the slice start
    so out-of-range (padded/garbage) keypoints read an in-bounds window;
    detection's border suppression keeps real keypoints interior.
    """
    starts = jnp.stack([rows.astype(jnp.int32) - margin,
                        cols.astype(jnp.int32) - margin], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1))
    return jax.lax.gather(image, starts, dn, slice_sizes=(size, size),
                          mode=jax.lax.GatherScatterMode.CLIP)


def _patch_grads(image: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Descriptor-window gradients from ONE patch gather per keypoint.

    Equivalent to sampling dense ``_sep_conv2(x, box, der)`` maps on the
    16x16 grid (same taps), but the smoothing/differencing runs on the
    (K, 18, 18) patches in registers — halving gather traffic and skipping
    the dense gradient maps entirely.
    """
    # window offsets -7..8 need image rows/cols (kp-8 .. kp+9)
    p = _patch_gather(image.astype(jnp.float32), rows, cols,
                      _S + 2, _S // 2)
    sm = 0.25 * p[:, :-2, :] + 0.5 * p[:, 1:-1, :] + 0.25 * p[:, 2:, :]
    gx = 0.5 * sm[:, :, :-2] - 0.5 * sm[:, :, 2:]
    dr = 0.5 * p[:, :-2, :] - 0.5 * p[:, 2:, :]
    gy = 0.25 * dr[:, :, :-2] + 0.5 * dr[:, :, 1:-1] + 0.25 * dr[:, :, 2:]
    return gx, gy


@functools.partial(jax.jit, static_argnames=("family",))
def describe_batch(images: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray,
                   family: str = "surf") -> jnp.ndarray:
    """Descriptors for a (P, H, W) image batch with (P, K) keypoints.

    Returns (P, K, D) float32 descriptors (D = 64/128, or 256 {0,1} bits for
    "orb").  Invalid (padded) keypoints produce harmless garbage rows — the
    matcher masks them by score validity.
    """
    x = images.astype(jnp.float32)
    box = np.array([0.25, 0.5, 0.25], np.float32)
    gw = jnp.asarray(_gauss_weight(_S, _S / 2.0) * _S * _S)

    if family == "orb":
        from .detect import _sep_conv2
        smooth = _sep_conv2(x, box, box)
        return jax.vmap(_orb_bits)(x, rows, cols, smooth)

    def one(x_i, r_i, c_i):
        gx, gy = _patch_grads(x_i, r_i, c_i)
        sx = gx * gw
        sy = gy * gw
        if family == "sift":
            return _sift_from_grads(sx, sy)
        return _surf_from_grads(sx, sy, extended=(family == "surf-extended"))

    return jax.vmap(one)(x, rows, cols)
