"""Incremental-ROI registration drivers.

The reference evaluates registration attempts one at a time on the host,
rotating the search direction and growing the ROI until a confident match
(reference: Stitcher.py:205-258 for the phase path, :306-367 for the feature
path), persisting the successful direction across pairs (Stitcher.py:361).

TPU-first redesign: attempts are evaluated for the WHOLE pair batch in one
device dispatch per (direction, scale) configuration — at most
``4 * max_scale`` dispatches per sequence instead of one host round trip per
attempt — and the reference's sequential decision procedure is replayed
exactly on the host over the precomputed scalar results.  The replay is
bit-identical to the serial algorithm because each attempt's outcome depends
only on (pair, direction, scale), never on the outcome of other attempts.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StitchConfig, direction_increase, max_roi_scale
from ..ops import phase_corr, roi


@dataclasses.dataclass
class PairRegistration:
    """Structured per-pair record (SURVEY §5: observability upgrade)."""
    ok: bool
    offset: Tuple[int, int]            # (drow, dcol) — reference's [dx, dy]
    offset_subpix: Tuple[float, float]  # sub-pixel offset for the global solver
    direction: int                     # direction that matched (0 if failed)
    scale: int                         # ROI scale i that matched (0 if failed)
    confidence: float                  # phase response / modal vote count
    attempts: int                      # number of attempts consumed


class AttemptCache:
    """Lazily-materialized (direction, scale) -> per-pair attempt results.

    One device dispatch fills the result for every pair at once; the host
    replay then consumes scalars.  ``evaluator(direction, ratio)`` must return
    host arrays of per-pair results.
    """

    def __init__(self, evaluator: Callable[[int, float], Dict[str, np.ndarray]]):
        self._evaluator = evaluator
        self._cache: Dict[Tuple[int, int], Dict[str, np.ndarray]] = {}
        self.dispatches = 0

    def get(self, direction: int, scale: int, ratio: float) -> Dict[str, np.ndarray]:
        key = (direction, scale)
        if key not in self._cache:
            self._cache[key] = self._evaluator(direction, scale * ratio)
            self.dispatches += 1
        return self._cache[key]


def _replay_incremental(num_pairs: int, cfg: StitchConfig,
                        cache: AttemptCache,
                        accept: Callable[[Dict[str, np.ndarray], int], bool],
                        extract: Callable[[Dict[str, np.ndarray], int], Tuple[float, float, float]],
                        shape: Tuple[int, int]) -> List[PairRegistration]:
    """Replay the reference's scale-growth x direction-rotation search.

    ``accept(results, k)`` decides whether attempt ``results`` succeeded for
    pair ``k``; ``extract`` returns (drow_f, dcol_f, confidence) of the
    strip-local offset.  Exact semantics of Stitcher.py:205-258 / :306-367
    including direction persistence across pairs.
    """
    out: List[PairRegistration] = []
    direction = cfg.direction
    max_i = max_roi_scale(cfg.roi_ratio)
    for k in range(num_pairs):
        ini_direction = direction
        local_direction = ini_direction
        status = False
        attempts = 0
        best = None
        for i in range(1, max_i):
            while True:
                res = cache.get(local_direction, i, cfg.roi_ratio)
                attempts += 1
                if accept(res, k):
                    status = True
                    best = (local_direction, i, extract(res, k))
                if status:
                    break
                local_direction = direction_increase(local_direction, cfg.direct_incre)
                if local_direction == ini_direction:
                    break
            if status:
                break
        if status:
            d, i, (drow_f, dcol_f, conf) = best
            mr, mc = roi.margin_correction(d, shape, shape, i * cfg.roi_ratio)
            # reference truncates the sub-pixel strip offset BEFORE the margin
            # correction (Stitcher.py:231-232 then :243-253)
            drow = int(drow_f) + mr
            dcol = int(dcol_f) + mc
            direction = d
            out.append(PairRegistration(
                ok=True, offset=(drow, dcol),
                offset_subpix=(drow_f + mr, dcol_f + mc),
                direction=d, scale=i, confidence=conf, attempts=attempts))
        else:
            out.append(PairRegistration(
                ok=False, offset=(0, 0), offset_subpix=(0.0, 0.0),
                direction=0, scale=0, confidence=0.0, attempts=attempts))
    return out


# --------------------------------------------------------------------------
# Phase-correlation incremental registrar (reference Stitcher.py:205-258)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("direction", "ratio", "hp", "wp"))
def _phase_attempt_jit(images: jnp.ndarray, direction: int, ratio: float,
                       hp: int, wp: int):
    """All pairs' strips for one (direction, ratio) -> phase correlation.

    ``images``: (N, H, W) uint8 device batch; pairs are (i, i+1).
    Slice + cast + FFT fuse into one XLA program; nothing round-trips.
    """
    a = images[:-1]
    b = images[1:]
    ra, rb = roi.extract_strips(a, b, direction, ratio)
    f = jax.vmap(lambda x, y: phase_corr._phase_correlate_one(
        x.astype(jnp.float32), y.astype(jnp.float32), hp, wp))
    return f(ra, rb)


def register_sequence_phase(images: np.ndarray, cfg: StitchConfig
                            ) -> List[PairRegistration]:
    """Incremental phase-correlation registration of a full sequence.

    ``images``: (N, H, W) uint8 grayscale batch (host or device).
    Replaces the reference's per-pair, per-attempt cv2.phaseCorrelate loop.
    """
    images_dev = jnp.asarray(images)
    n, h, w = images.shape
    if n < 2:
        return []

    def evaluator(direction: int, ratio: float) -> Dict[str, np.ndarray]:
        if direction in (1, 3):
            sh, sw = roi.strip_length(h, ratio), w
        else:
            sh, sw = h, roi.strip_length(w, ratio)
        hp, wp = phase_corr.optimal_dft_size(sh), phase_corr.optimal_dft_size(sw)
        sx, sy, resp = _phase_attempt_jit(images_dev, direction, ratio, hp, wp)
        return {"sx": np.asarray(sx), "sy": np.asarray(sy),
                "resp": np.asarray(resp)}

    cache = AttemptCache(evaluator)

    def accept(res: Dict[str, np.ndarray], k: int) -> bool:
        return bool(res["resp"][k] > cfg.phase_response_threshold)

    def extract(res: Dict[str, np.ndarray], k: int) -> Tuple[float, float, float]:
        # cv2 returns (x=col, y=row); reference maps offset=[int(y), int(x)]
        return float(res["sy"][k]), float(res["sx"][k]), float(res["resp"][k])

    return _replay_incremental(n - 1, cfg, cache, accept, extract, (h, w))


def register_sequence_phase_whole(images: np.ndarray, cfg: StitchConfig
                                  ) -> List[PairRegistration]:
    """Whole-image phase correlation for all pairs in one dispatch.

    Working replacement for the reference's vestigial
    ``calculateOffsetForPhaseCorrleate`` (Stitcher.py:184-203), whose
    ``self.phase`` GPU-FFT module is missing: offset = [round(y), round(x)]
    per its intended semantics (Stitcher.py:198-199).
    """
    images_dev = jnp.asarray(images)
    n, h, w = images.shape
    if n < 2:
        return []
    hp, wp = phase_corr.optimal_dft_size(h), phase_corr.optimal_dft_size(w)
    sx, sy, resp = _phase_attempt_jit(images_dev, 1, 1.0, hp, wp)
    sx, sy, resp = np.asarray(sx), np.asarray(sy), np.asarray(resp)
    out: List[PairRegistration] = []
    for k in range(n - 1):
        ok = bool(resp[k] > cfg.phase_response_threshold)
        out.append(PairRegistration(
            ok=ok,
            offset=(int(np.round(sy[k])), int(np.round(sx[k]))),
            offset_subpix=(float(sy[k]), float(sx[k])),
            direction=cfg.direction if ok else 0,
            scale=0, confidence=float(resp[k]), attempts=1))
    return out


# --------------------------------------------------------------------------
# Feature-search registrars (reference Stitcher.py:260-367) — implemented in
# features.py's batched detect/describe/match/vote stack.
# --------------------------------------------------------------------------

def register_sequence_features_incre(images: np.ndarray, cfg: StitchConfig
                                     ) -> List[PairRegistration]:
    from . import feature_registration
    return feature_registration.register_sequence_features_incre(images, cfg)


def register_sequence_features(images: np.ndarray, cfg: StitchConfig
                               ) -> List[PairRegistration]:
    from . import feature_registration
    return feature_registration.register_sequence_features(images, cfg)
