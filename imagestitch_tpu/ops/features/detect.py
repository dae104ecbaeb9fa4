"""Batched keypoint detection.

TPU-native replacement for the reference's OpenCV detector calls
(reference: ImageUtility.py:248-276 detectAndDescribe; CUDA variants
appendix/myGpuFeatures.cpp:67-146).  Instead of translating SURF's integral
-image box filters (a scalar-heavy, branchy CPU/GPU design), the detector is
a bank of separable Gaussian-derivative convolutions — dense, fused,
MXU/VPU-friendly — with the same role: a scale-space blob response
(determinant of Hessian, SURF family) or a corner response (FAST/Harris
family for ORB parity).

Fixed-capacity outputs: every image yields exactly ``max_kp`` keypoints
(score-sorted, padded with score<=0) so all downstream shapes are static.
"""
from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _gauss_kernels(sigma: float, radius: int):
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    dg = -x / sigma ** 2 * g                     # first derivative
    ddg = (x ** 2 / sigma ** 4 - 1.0 / sigma ** 2) * g  # second derivative
    return (g.astype(np.float32), dg.astype(np.float32), ddg.astype(np.float32))


def _sep_conv2(x: jnp.ndarray, krow: np.ndarray, kcol: np.ndarray) -> jnp.ndarray:
    """Separable 2-D correlation on (..., H, W), reflect-edge padding."""
    r = len(krow) // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(r, r), (0, 0)], mode="edge")
    kr = jnp.asarray(krow, x.dtype)
    out = sum(xp[..., i:i + x.shape[-2], :] * kr[i] for i in range(len(krow)))
    c = len(kcol) // 2
    xp = jnp.pad(out, [(0, 0)] * (x.ndim - 2) + [(0, 0), (c, c)], mode="edge")
    kc = jnp.asarray(kcol, x.dtype)
    return sum(xp[..., :, i:i + x.shape[-1]] * kc[i] for i in range(len(kcol)))


def hessian_response(images: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Scale-normalized determinant-of-Hessian response at one scale.

    DoH = sigma^4 * (Lxx*Lyy - Lxy^2); the SURF box filters approximate
    exactly these second derivatives (Bay et al.; reference GPU analog
    myGpuFeatures.cpp:77 SURF_CUDA hessianThreshold).
    """
    radius = max(2, int(math.ceil(3.0 * sigma)))
    g, dg, ddg = _gauss_kernels(sigma, radius)
    lxx = _sep_conv2(images, g, ddg)
    lyy = _sep_conv2(images, ddg, g)
    lxy = _sep_conv2(images, dg, dg)
    return (sigma ** 4) * (lxx * lyy - lxy * lxy)


def fast_corner_response(images: jnp.ndarray) -> jnp.ndarray:
    """Harris-style corner response (ORB/FAST family stand-in).

    ORB's FAST-9 test is a branchy per-pixel scan; its TPU-native analog is
    the dense Shi-Tomasi/Harris response (same corner semantics, pure convs).
    """
    sob = np.array([1.0, 0.0, -1.0], np.float32)
    avg = np.array([0.25, 0.5, 0.25], np.float32)
    ix = _sep_conv2(images, avg, sob)
    iy = _sep_conv2(images, sob, avg)
    box = np.ones(5, np.float32) / 5.0
    sxx = _sep_conv2(ix * ix, box, box)
    syy = _sep_conv2(iy * iy, box, box)
    sxy = _sep_conv2(ix * iy, box, box)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - 0.04 * tr * tr


def _nms3(resp: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression mask on (..., H, W)."""
    neg = jnp.asarray(-jnp.inf, resp.dtype)
    p = jnp.pad(resp, [(0, 0)] * (resp.ndim - 2) + [(1, 1), (1, 1)],
                constant_values=neg)
    m = resp
    for di in range(3):
        for dj in range(3):
            if di == 1 and dj == 1:
                continue
            m = jnp.maximum(m, p[..., di:di + resp.shape[-2],
                                 dj:dj + resp.shape[-1]])
    return resp >= m  # ties keep both (filtered later by score ordering)


@functools.partial(jax.jit, static_argnames=("max_kp", "n_scales", "border",
                                             "family"))
def detect_batch(images: jnp.ndarray, max_kp: int = 1024,
                 threshold: float = 100.0, n_scales: int = 3,
                 base_sigma: float = 1.2, border: int = 8,
                 family: str = "hessian"
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Detect up to ``max_kp`` keypoints per image of a (P, H, W) batch.

    Returns (rows, cols, scores): each (P, max_kp) float32; padded entries
    have score <= 0 (invalid).  Multi-scale responses are max-pooled into a
    single response map (scale argmax is not needed for translation voting).
    """
    x = images.astype(jnp.float32)
    if family == "hessian":
        resp = hessian_response(x, base_sigma)
        for s in range(1, n_scales):
            resp = jnp.maximum(resp, hessian_response(x, base_sigma * (1.6 ** s)))
    else:
        resp = fast_corner_response(x)
    h, w = x.shape[-2], x.shape[-1]
    keep = _nms3(resp) & (resp > threshold)
    # suppress the border band (descriptor window must fit)
    ri = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = ((ri >= border) & (ri < h - border) &
              (ci >= border) & (ci < w - border))
    score = jnp.where(keep & inside, resp, 0.0)

    flat = score.reshape(score.shape[:-2] + (h * w,))
    top_scores, top_idx = jax.lax.top_k(flat, max_kp)
    rows = (top_idx // w).astype(jnp.float32)
    cols = (top_idx % w).astype(jnp.float32)
    return rows, cols, top_scores
