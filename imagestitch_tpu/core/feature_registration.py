"""Feature-search registration (incremental and whole-image).

TPU-native rebuild of the reference's feature registrars:
  * ``register_sequence_features_incre`` — calculateOffsetForFeatureSearchIncre
    (reference: Stitcher.py:306-367), the VFSMS core;
  * ``register_sequence_features``       — calculateOffsetForFeatureSearch
    (reference: Stitcher.py:260-304).

Execution model (contrast with the reference's one-OpenCV-call-per-attempt
host loop): each (direction, scale) configuration evaluates detection,
description, MXU matching and mode voting for EVERY pair in chunked batched
dispatches; the reference's sequential scale-growth/direction-rotation
decision procedure then replays on host scalars (core/registration.py).

Feature-cache parity: the reference caches image B's features to reuse as the
next pair's A (Stitcher.py:14-18, :278-290).  Our batched whole-image path
detects every image's features exactly once per sequence — the cache's effect
(each image detected once) is structural, and results are identical because
detection is deterministic and independent of pair order.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StitchConfig
from ..ops import enhance, roi
from ..ops.features import describe, detect, match, vote
from . import registration as reg


def _enhance_mode(cfg: StitchConfig) -> str:
    if not cfg.enhance.enabled:
        return "none"
    return "clahe" if cfg.enhance.use_clahe else "equalize"


def _families(cfg: StitchConfig) -> Tuple[str, str, str]:
    """(detector_family, descriptor_family, metric) per featureMethod."""
    m = cfg.features.method
    if m == "orb":
        return "corner", "orb", "hamming"
    if m == "sift":
        return "hessian", "sift", "l2"
    if m == "surf" and cfg.features.extended:
        return "hessian", "surf-extended", "l2"
    return "hessian", "surf", "l2"


@functools.partial(jax.jit, static_argnames=(
    "direction", "ratio", "max_kp", "det_family", "desc_family", "metric",
    "vote_method", "enhance_mode", "enhance_tiles", "use_pallas"))
def _feature_attempt_jit(images: jnp.ndarray, direction: int, ratio: float,
                         max_kp: int, det_family: str, desc_family: str,
                         metric: str, threshold: float, search_ratio: float,
                         max_distance: float, vote_method: str = "mode",
                         enhance_mode: str = "none",
                         enhance_clip: float = 20.0, enhance_tiles: int = 5,
                         use_pallas: bool = False):
    """One (direction, scale) attempt for a chunk of pairs.

    images: (C+1, H, W) uint8 slice whose adjacent pairs are evaluated.
    Returns per-pair (drow_strip, dcol_strip, votes) arrays of shape (C,).
    """
    a = images[:-1]
    b = images[1:]
    ra, rb = roi.extract_strips(a, b, direction, ratio)
    if enhance_mode != "none":
        # reference enhances the ROI strips in-place (Stitcher.py:327-334)
        ra = enhance.enhance_batch(ra, enhance_mode == "clahe",
                                   enhance_clip, enhance_tiles)
        rb = enhance.enhance_batch(rb, enhance_mode == "clahe",
                                   enhance_clip, enhance_tiles)
    rows_a, cols_a, sc_a = detect.detect_batch(
        ra, max_kp=max_kp, threshold=threshold,
        family=det_family)
    rows_b, cols_b, sc_b = detect.detect_batch(
        rb, max_kp=max_kp, threshold=threshold,
        family=det_family)
    da = describe.describe_batch(ra, rows_a, cols_a, family=desc_family)
    db = describe.describe_batch(rb, rows_b, cols_b, family=desc_family)
    valid_a = sc_a > 0
    valid_b = sc_b > 0
    train_idx, ok = match.match_batch(da, db, valid_a, valid_b,
                                      search_ratio, max_distance, metric,
                                      use_pallas=use_pallas)
    d_row, d_col, v = jax.vmap(vote.displacement_from_matches)(
        rows_a, cols_a, rows_b, cols_b, train_idx, ok)
    if vote_method == "ransac":
        return vote.ransac_translation_batch(d_row, d_col, v)
    return vote.mode_vote_batch(d_row, d_col, v)


def _chunked_attempt(images_dev, direction: int, ratio: float,
                     cfg: StitchConfig) -> Dict[str, np.ndarray]:
    """Evaluate one (direction, ratio) config for all pairs, chunked to bound
    the (C, K, K) distance-matrix footprint."""
    det_family, desc_family, metric = _families(cfg)
    n = images_dev.shape[0]
    h, w = images_dev.shape[1:3]
    max_kp = cfg.features.max_keypoints
    if direction in (1, 3):
        strip_px = roi.strip_length(h, ratio) * w
    else:
        strip_px = h * roi.strip_length(w, ratio)
    # bound BOTH the (C, K, K) distance matrices and the ~40 float strip-size
    # conv temporaries the detector generates per pair
    dist_chunk = max(1, (1 << 28) // (4 * max_kp * max_kp))
    conv_chunk = max(1, (2 << 30) // (strip_px * 4 * 40))
    chunk = cfg.pair_batch or min(dist_chunk, conv_chunk)
    drows, dcols, votes = [], [], []
    start = 0
    while start < n - 1:
        stop = min(start + chunk, n - 1)
        img_chunk = images_dev[start:stop + 1]
        pad = (chunk + 1) - img_chunk.shape[0]
        if pad > 0 and n - 1 > chunk:
            # pad the tail chunk to the uniform shape: ONE compile per config
            img_chunk = jnp.concatenate(
                [img_chunk, jnp.repeat(img_chunk[-1:], pad, axis=0)])
        dr, dc, nv = _feature_attempt_jit(
            img_chunk, direction, ratio, max_kp,
            det_family, desc_family, metric,
            cfg.features.hessian_threshold, cfg.features.search_ratio,
            float(cfg.features.orb_max_distance),
            vote_method=cfg.offset_calculate,
            enhance_mode=_enhance_mode(cfg),
            enhance_clip=cfg.enhance.clip_limit,
            enhance_tiles=cfg.enhance.tile_size,
            use_pallas=cfg.use_pallas and jax.default_backend() == "tpu")
        keep = stop - start
        drows.append(np.asarray(dr)[:keep])
        dcols.append(np.asarray(dc)[:keep])
        votes.append(np.asarray(nv)[:keep])
        start = stop
    return {"drow": np.concatenate(drows), "dcol": np.concatenate(dcols),
            "votes": np.concatenate(votes)}


def register_sequence_features_incre(images: np.ndarray, cfg: StitchConfig
                                     ) -> List[reg.PairRegistration]:
    """Incremental ROI feature search over a (N, H, W) grayscale batch."""
    images_dev = jnp.asarray(images)
    n, h, w = images.shape
    if n < 2:
        return []

    def evaluator(direction: int, ratio: float) -> Dict[str, np.ndarray]:
        return _chunked_attempt(images_dev, direction, ratio, cfg)

    cache = reg.AttemptCache(evaluator)

    def accept(res: Dict[str, np.ndarray], k: int) -> bool:
        return bool(res["votes"][k] >= cfg.offset_evaluate)

    def extract(res: Dict[str, np.ndarray], k: int):
        # already integer (truncated) strip offsets; confidence = vote count
        return (float(res["drow"][k]), float(res["dcol"][k]),
                float(res["votes"][k]))

    return reg._replay_incremental(n - 1, cfg, cache, accept, extract, (h, w))


def register_sequence_features(images: np.ndarray, cfg: StitchConfig
                               ) -> List[reg.PairRegistration]:
    """Whole-image feature search for every adjacent pair (non-incremental).

    Each image is detected/described once (cache-parity, see module
    docstring); adjacent pairs are then matched and mode-voted in batch.
    """
    images_dev = jnp.asarray(images)
    n, h, w = images.shape
    if n < 2:
        return []
    det_family, desc_family, metric = _families(cfg)
    max_kp = cfg.features.max_keypoints

    # detect/describe every image once, in chunks
    rows, cols, scores, descs = [], [], [], []
    chunk = max(1, (1 << 28) // (4 * h * w * 4))
    emode = _enhance_mode(cfg)
    for s in range(0, n, chunk):
        im = images_dev[s:s + chunk]
        if emode != "none":
            # reference enhances whole images on this path (Stitcher.py:269-276)
            im = enhance.enhance_batch(im, emode == "clahe",
                                       cfg.enhance.clip_limit,
                                       cfg.enhance.tile_size)
        r, c, sc = detect.detect_batch(im, max_kp=max_kp,
                                       threshold=cfg.features.hessian_threshold,
                                       family=det_family)
        d = describe.describe_batch(im, r, c, family=desc_family)
        rows.append(r); cols.append(c); scores.append(sc); descs.append(d)
    rows = jnp.concatenate(rows)
    cols = jnp.concatenate(cols)
    scores = jnp.concatenate(scores)
    descs = jnp.concatenate(descs)
    valid = scores > 0

    # match adjacent pairs in chunks
    out: List[reg.PairRegistration] = []
    pchunk = max(1, (1 << 28) // (4 * max_kp * max_kp))
    for s in range(0, n - 1, pchunk):
        e = min(s + pchunk, n - 1)
        ti, ok = match.match_batch(
            descs[s:e], descs[s + 1:e + 1], valid[s:e], valid[s + 1:e + 1],
            cfg.features.search_ratio, float(cfg.features.orb_max_distance),
            metric, use_pallas=cfg.use_pallas and jax.default_backend() == "tpu")
        d_row, d_col, v = jax.vmap(vote.displacement_from_matches)(
            rows[s:e], cols[s:e], rows[s + 1:e + 1], cols[s + 1:e + 1], ti, ok)
        if cfg.offset_calculate == "ransac":
            dr, dc, nv = vote.ransac_translation_batch(d_row, d_col, v)
        else:
            dr, dc, nv = vote.mode_vote_batch(d_row, d_col, v)
        dr, dc, nv = np.asarray(dr), np.asarray(dc), np.asarray(nv)
        for k in range(e - s):
            okk = bool(nv[k] >= cfg.offset_evaluate)
            out.append(reg.PairRegistration(
                ok=okk,
                offset=(int(dr[k]), int(dc[k])) if okk else (0, 0),
                offset_subpix=(float(dr[k]), float(dc[k])) if okk else (0.0, 0.0),
                direction=cfg.direction if okk else 0,
                scale=0, confidence=float(nv[k]), attempts=1))
    return out
