"""Host-side image decode/encode.

This is the framework's host<->device boundary layer — the TPU-native
equivalent of the reference's numpy<->cv::Mat bridge
(reference: appendix/conversion.cpp:1-262).  Decode happens on the host
(JPEG/PNG via OpenCV when present, PIL otherwise); arrays are handed to JAX
as uint8 batches and all further compute is on-device.

Byte-level reading mirrors the reference's non-ASCII-path-tolerant decode
(reference: Stitcher.py:68-69 uses imdecode(np.fromfile(...))) by always
reading bytes first.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

try:  # pragma: no cover - environment probe
    import cv2  # type: ignore

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

try:  # pragma: no cover - environment probe
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except Exception:  # pragma: no cover
    Image = None
    _HAS_PIL = False


def imread(path: str, color: bool) -> np.ndarray:
    """Decode an image file.

    Returns uint8 ``(H, W)`` when ``color`` is False, else ``(H, W, 3)`` in
    **BGR** channel order (reference parity: the reference composes and writes
    with OpenCV's BGR convention, Stitcher.py:382).
    """
    data = np.fromfile(path, dtype=np.uint8)
    if _HAS_CV2:
        flag = cv2.IMREAD_COLOR if color else cv2.IMREAD_GRAYSCALE
        img = cv2.imdecode(data, flag)
        if img is None:
            raise IOError(f"failed to decode image: {path}")
        return img
    if _HAS_PIL:
        import io as _io

        with Image.open(_io.BytesIO(data.tobytes())) as im:
            if color:
                arr = np.asarray(im.convert("RGB"), dtype=np.uint8)
                return arr[..., ::-1].copy()  # RGB -> BGR
            # PIL 'L' uses ITU-R 601-2; close to cv2's grayscale weights.
            return np.asarray(im.convert("L"), dtype=np.uint8)
    raise RuntimeError("no image decoder available (need cv2 or PIL)")


def imwrite(path: str, image: np.ndarray) -> None:
    """Encode and write an image (BGR for color input)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    image = np.asarray(image)
    if image.dtype != np.uint8:
        image = np.clip(image, 0, 255).astype(np.uint8)
    if _HAS_CV2:
        ok = cv2.imwrite(path, image)
        if not ok:
            raise IOError(f"failed to write image: {path}")
        return
    if _HAS_PIL:
        if image.ndim == 3:
            Image.fromarray(image[..., ::-1]).save(path)
        else:
            Image.fromarray(image).save(path)
        return
    raise RuntimeError("no image encoder available (need cv2 or PIL)")


def to_gray(image: np.ndarray) -> np.ndarray:
    """BGR uint8 -> grayscale uint8 with OpenCV's rounding convention."""
    if image.ndim == 2:
        return image
    b = image[..., 0].astype(np.float32)
    g = image[..., 1].astype(np.float32)
    r = image[..., 2].astype(np.float32)
    return np.clip(np.round(0.114 * b + 0.587 * g + 0.299 * r), 0, 255).astype(np.uint8)
