"""Dataset discovery and batched loading.

Replaces the reference's per-project glob loop (reference: Stitcher.py:129-182,
which hardcodes Windows ``"\\"`` separators) with portable paths, and replaces
its one-image-at-a-time decode inside the hot loop (Stitcher.py:68-69,
:400-403) with a single host-side batch decode whose result is shipped to the
device **once** as a ``(N, H, W[, C])`` uint8 array.
"""
from __future__ import annotations

import glob
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from . import codec


def list_project_images(project_address: str, sub_project: int,
                        file_extension: str = "jpg") -> List[str]:
    """Files of numbered sub-project ``sub_project`` (reference Stitcher.py:167-168).

    Extension matching is case-insensitive (the reference ran on Windows
    where glob is case-insensitive; the zirconCL demo ships ``.Jpg`` files).
    Sorted for determinism (glob order is fs-dependent; the demo sets use
    zero-padded names so lexicographic == capture order).
    """
    d = os.path.join(project_address, str(sub_project))
    if not os.path.isdir(d):
        return []
    ext = file_extension.lower()
    return sorted(os.path.join(d, f) for f in os.listdir(d)
                  if f.lower().endswith("." + ext))


@dataclass
class ImageBatch:
    """A decoded dataset resident as one dense batch.

    gray:  (N, H, W)    uint8 — registration always runs on grayscale
                        (reference parity: Stitcher.py:68-69).
    color: (N, H, W, 3) uint8 BGR, or None in gray mode — composition input
                        (reference parity: Stitcher.py:381-384).
    files: source paths, capture order.
    """
    gray: np.ndarray
    color: Optional[np.ndarray]
    files: List[str]
    # host copy of ``gray`` when ``gray`` is device-resident and the caller
    # wants streamed output (stream_out assembles from host frames); None
    # when ``gray`` itself is host-side or streaming is off
    gray_host: Optional[np.ndarray] = None

    @property
    def num_images(self) -> int:
        return self.gray.shape[0]

    @property
    def image_shape(self):
        return self.gray.shape[1:3]


def load_batch(files: Sequence[str], color_mode: bool,
               loader=None) -> ImageBatch:
    """Decode ``files`` into one contiguous batch.

    All images of a micrograph sequence share one sensor geometry; mixed
    shapes are rejected (the reference would silently misbehave).
    ``loader`` may supply a native prefetching reader (native/ runtime).
    """
    if not files:
        raise ValueError("empty file list")
    grays: List[np.ndarray] = []
    colors: List[np.ndarray] = []
    if loader is None:
        # default to the native thread-pool decoder; degrades internally
        from .native_loader import NativeLoader
        loader = NativeLoader()
    decoded = loader.read_all(files, color_mode)
    if color_mode:
        from .native_loader import bgr_to_gray_native
        for f, img in zip(files, decoded):
            colors.append(img)
            g = bgr_to_gray_native(img)
            grays.append(g if g is not None else codec.to_gray(img))
    else:
        grays = list(decoded)
    shape0 = grays[0].shape
    for f, g in zip(files, grays):
        if g.shape != shape0:
            raise ValueError(
                f"inconsistent image shapes in sequence: {files[0]}={shape0} vs {f}={g.shape}")
    gray = np.stack(grays)
    color = np.stack(colors) if color_mode else None
    return ImageBatch(gray=gray, color=color, files=list(files))
