"""Determinism: same input -> same bits (SURVEY §5 race-detection row).

The reference's concurrency hazards are global mutable class-attribute
config and C++ module-global result state (myGpuSurf.cpp:17-19); this
framework's answer is pure-functional kernels + frozen config, and these
tests pin it: two independent runs over the same batch produce BIT-equal
pools, offsets, and panoramas.
"""
import dataclasses

import numpy as np

import jax.numpy as jnp

from imagestitch_tpu import StitchConfig
from imagestitch_tpu.core import feature_registration as freg
from imagestitch_tpu.core.compose import compose


def _frames(seed=11, n=4, h=160, w=192, step=60):
    rng = np.random.default_rng(seed)
    base = np.zeros((step * n + h, w), np.float32)
    ys, xs = rng.integers(3, step * n + h - 3, 1500), rng.integers(3, w - 3, 1500)
    for y, x, a in zip(ys, xs, rng.uniform(60, 200, 1500)):
        base[y - 2:y + 3, x - 2:x + 3] += a
    base = np.clip(base, 0, 255).astype(np.uint8)
    return np.stack([base[step * i:step * i + h] for i in range(n)])


def test_pool_and_offsets_bit_deterministic():
    images = _frames()
    cfg = StitchConfig(registration="feature_incre", direction=1,
                       direct_incre=0, roi_ratio=0.3)
    cfg = cfg.replace(features=dataclasses.replace(cfg.features,
                                                   upright=True))
    pools = []
    for _ in range(2):
        pools.append(freg._precompute_pool(jnp.asarray(images), cfg))
    for a, b in zip(*pools):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    r1 = freg.register_sequence_features_incre(images, cfg)
    r2 = freg.register_sequence_features_incre(images, cfg)
    assert [(r.ok, r.offset, r.offset_subpix, r.confidence) for r in r1] \
        == [(r.ok, r.offset, r.offset_subpix, r.confidence) for r in r2]


def test_compose_bit_deterministic():
    images = _frames(seed=3)
    cfg = StitchConfig(color_mode=False, fuse_method="fadeInAndFadeOut",
                       registration="phase_incre")
    offs = [(60, 0)] * (len(images) - 1)
    p1 = compose(images, offs, cfg)
    p2 = compose(images, offs, cfg)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
