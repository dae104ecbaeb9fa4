"""Image utilities: resize and tilt rectification.

Parity for the reference's auxiliary image helpers:
  * ``resize``        — resizeImg (reference: ImageUtility.py:311-323),
    INTER_AREA-equivalent anti-aliased scaling;
  * ``rectify_final`` — rectifyFinalImg (reference: ImageUtility.py:325-368),
    the experimental corner-occupancy tilt heuristic (reference marks it
    test-only/incomplete; semantics preserved, including its odd
    ``atan(x * 180/pi)`` angle formula).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def resize(image: np.ndarray, resize_times: float) -> np.ndarray:
    """Anti-aliased scaling (reference default cv2.INTER_AREA)."""
    h, w = image.shape[:2]
    out_h, out_w = int(h * resize_times), int(w * resize_times)
    x = jnp.asarray(image, jnp.float32)
    shape = (out_h, out_w) + x.shape[2:]
    # jax.image 'linear' with antialias=True matches INTER_AREA's averaging
    y = jax.image.resize(x, shape, method="linear", antialias=True)
    return np.asarray(jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8))


def _rotate(image: np.ndarray, angle_deg: float) -> np.ndarray:
    """warpAffine-equivalent rotation about the image center (bilinear)."""
    h, w = image.shape[:2]
    cy, cx = h // 2, w // 2
    a = math.radians(angle_deg)
    cos, sin = math.cos(a), math.sin(a)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # inverse map (dst -> src) of cv2.getRotationMatrix2D convention
    xs = cos * (xx - cx) + sin * (yy - cy) + cx
    ys = -sin * (xx - cx) + cos * (yy - cy) + cy
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = xs - jnp.floor(xs)
    fy = ys - jnp.floor(ys)
    img = jnp.asarray(image, jnp.float32)
    v = ((1 - fy) * (1 - fx) * img[y0, x0] + (1 - fy) * fx * img[y0, x1] +
         fy * (1 - fx) * img[y1, x0] + fy * fx * img[y1, x1])
    inside = (xs >= 0) & (xs <= w - 1) & (ys >= 0) & (ys <= h - 1)
    v = jnp.where(inside, v, 0.0)
    return np.asarray(jnp.clip(jnp.round(v), 0, 255).astype(jnp.uint8))


def rectify_final(image: np.ndarray, region_length: int = 10) -> np.ndarray:
    """Tilt rectification heuristic (reference semantics, :335-368).

    Rotates only when exactly one diagonal pair of corner regions is empty;
    otherwise returns the input unchanged."""
    h, w = image.shape[:2]
    ul = image[:region_length, :region_length].sum()
    ur = image[:region_length, w - region_length:].sum()
    bl = image[h - region_length:, :region_length].sum()
    br = image[h - region_length:, w - region_length:].sum()
    nonzero = np.count_nonzero(image[:, 0])
    if nonzero / h < 0.3:
        return image
    center = (w // 2, h // 2)
    angle = math.atan(center[1] / center[0] * 180 / math.pi)  # ref formula
    if ul == 0 and br == 0 and ur != 0 and bl != 0:
        return _rotate(image, -angle)
    if ul != 0 and br != 0 and ur == 0 and bl == 0:
        return _rotate(image, angle)
    return image
