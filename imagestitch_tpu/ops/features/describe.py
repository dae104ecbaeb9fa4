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
    """
    h, w = image.shape
    off = jnp.asarray(offsets, jnp.int32)
    r = jnp.clip(rows.astype(jnp.int32)[:, None] + off[None, :], 0, h - 1)
    c = jnp.clip(cols.astype(jnp.int32)[:, None] + off[None, :], 0, w - 1)
    return image[r[:, :, None], c[:, None, :]]


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


def _orb_bits(image: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray,
              smooth: jnp.ndarray) -> jnp.ndarray:
    """(K, 256) float {0,1} BRIEF bits (float form feeds the Hamming matmul)."""
    h, w = image.shape
    r0 = rows.astype(jnp.int32)
    c0 = cols.astype(jnp.int32)

    def sample(pts):
        r = jnp.clip(r0[:, None] + pts[:, 0][None, :], 0, h - 1)
        c = jnp.clip(c0[:, None] + pts[:, 1][None, :], 0, w - 1)
        return smooth[r, c]

    i1 = sample(jnp.asarray(_ORB_P1))
    i2 = sample(jnp.asarray(_ORB_P2))
    return (i1 < i2).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("family",))
def describe_batch(images: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray,
                   family: str = "surf") -> jnp.ndarray:
    """Descriptors for a (P, H, W) image batch with (P, K) keypoints.

    Returns (P, K, D) float32 descriptors (D = 64/128, or 256 {0,1} bits for
    "orb").  Invalid (padded) keypoints produce harmless garbage rows — the
    matcher masks them by score validity.
    """
    x = images.astype(jnp.float32)
    # Haar-style gradients at the descriptor scale (box-smoothed central diff)
    box = np.array([0.25, 0.5, 0.25], np.float32)
    der = np.array([0.5, 0.0, -0.5], np.float32)
    from .detect import _sep_conv2
    gx = _sep_conv2(x, box, der)
    gy = _sep_conv2(x, der, box)

    offs = np.arange(_S, dtype=np.int32) - (_S // 2 - 1)
    gw = jnp.asarray(_gauss_weight(_S, _S / 2.0) * _S * _S)

    if family == "orb":
        smooth = _sep_conv2(x, box, box)
        return jax.vmap(_orb_bits)(x, rows, cols, smooth)

    def one(gx_i, gy_i, r_i, c_i):
        sx = _sample_grid(gx_i, r_i, c_i, offs) * gw
        sy = _sample_grid(gy_i, r_i, c_i, offs) * gw
        if family == "sift":
            return _sift_from_grads(sx, sy)
        return _surf_from_grads(sx, sy, extended=(family == "surf-extended"))

    return jax.vmap(one)(gx, gy, rows, cols)
