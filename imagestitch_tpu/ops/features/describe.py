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


def _surf_descriptors_conv(x: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray,
                           rows: jnp.ndarray, cols: jnp.ndarray,
                           w1: np.ndarray, extended: bool) -> jnp.ndarray:
    """SURF vectors via dense subregion-sum maps + one slice-gather each.

    Exactly the math of ``_surf_from_grads`` on a gathered 16x16 window —
    but because every descriptor component is a LINEAR filter of the
    (masked) gradient maps, we precompute each component as a tiny
    separable convolution (4-tap Gaussian-segment outer products; row
    passes shared across column kernels), then SHIFT every component map
    so that all D components of the window with origin (p, q) live at
    position (p, q) of one channels-last (H', W', D) stack.  Each keypoint
    then needs exactly ONE contiguous (1, 1, D) gather slice.  TPU gathers
    are transaction-bound, so K slice-fetches beat the (K, 16, 16)x2 grid
    gather of the direct approach by ~10x.

    Stack is bf16 (descriptors are L2-normalized and ratio-tested; 8
    mantissa bits are plenty) — halves the HBM traffic of materializing it.

    Valid for keypoints whose 16x16 window is interior, which detection's
    border suppression guarantees (detect_batch border=8); padded/garbage
    keypoints produce clipped garbage rows, masked downstream.
    """
    h, w = gx.shape
    if not extended:
        base = [gx, gy, jnp.abs(gx), jnp.abs(gy)]
    else:
        pos_y = gy >= 0
        pos_x = gx >= 0
        agx, agy = jnp.abs(gx), jnp.abs(gy)
        zero = jnp.zeros_like(gx)
        base = [jnp.where(pos_y, gx, zero), jnp.where(~pos_y, gx, zero),
                jnp.where(pos_y, agx, zero), jnp.where(~pos_y, agx, zero),
                jnp.where(pos_x, gy, zero), jnp.where(~pos_x, gy, zero),
                jnp.where(pos_x, agy, zero), jnp.where(~pos_x, agy, zero)]
    nb = len(base)
    # window origin (p, q) = keypoint - (S/2 - 1); subregion (a, b) starts at
    # (p + 4a, q + 4b); valid origins: p in [0, h - S], q in [0, w - S]
    ho, wo = h - _S + 1, w - _S + 1
    # shared row passes: rowc[m][a] = rows of base[m] conv w1[4a:4a+4]
    chans = []
    rowc = [[sum(float(w1[4 * a + t]) * m[4 * a + t: 4 * a + t + ho, :]
                 for t in range(4)) for a in range(4)] for m in base]
    for a in range(4):
        for b in range(4):
            for mi in range(nb):
                chans.append(sum(
                    float(w1[4 * b + u]) *
                    rowc[mi][a][:, 4 * b + u: 4 * b + u + wo]
                    for u in range(4)))
    # channel order: (subregion-major, stat-minor) == _surf_from_grads order
    stack = jnp.stack(chans, axis=-1).astype(jnp.bfloat16)  # (ho, wo, 16*nb)

    k = rows.shape[0]
    p = jnp.clip(rows.astype(jnp.int32) - (_S // 2 - 1), 0, ho - 1)
    q = jnp.clip(cols.astype(jnp.int32) - (_S // 2 - 1), 0, wo - 1)
    starts = jnp.stack([p, q], axis=-1)                      # (K, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0, 1), start_index_map=(0, 1))
    d = jax.lax.gather(stack, starts, dn,
                       slice_sizes=(1, 1, 16 * nb)).astype(jnp.float32)
    return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-8)


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

    if family in ("surf", "surf-extended"):
        # separable square root of gw: gw[u,v] = w1[u]*w1[v]
        ax = np.arange(_S, dtype=np.float64) - (_S - 1) / 2.0
        g1 = np.exp(-0.5 * (ax / (_S / 2.0)) ** 2)
        w1 = (_S * g1 / g1.sum()).astype(np.float32)
        return jax.vmap(lambda gxi, gyi, ri, ci: _surf_descriptors_conv(
            None, gxi, gyi, ri, ci, w1,
            extended=(family == "surf-extended")))(gx, gy, rows, cols)

    def one(gx_i, gy_i, r_i, c_i):
        sx = _sample_grid(gx_i, r_i, c_i, offs) * gw
        sy = _sample_grid(gy_i, r_i, c_i, offs) * gw
        if family == "sift":
            return _sift_from_grads(sx, sy)
        return _surf_from_grads(sx, sy, extended=(family == "surf-extended"))

    return jax.vmap(one)(gx, gy, rows, cols)
