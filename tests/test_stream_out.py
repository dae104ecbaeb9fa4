"""Streamed / host output modes vs the device composer.

Claims under test (core/stream_out.py): (a) host paste replay +
final-canvas rect patches reproduces the device panorama EXACTLY
(compose_streamed); (b) the host float64 composers (compose_host /
compose_color_host / compose_host_positions — the reference's own
arithmetic, zero panorama link bytes) agree with the device f32 composer
to ±1 LSB on a small blended fraction.  Covered across fuse modes,
serpentine/negative-rebase layouts, and corner overlaps.
"""
import numpy as np
import pytest

from imagestitch_tpu import StitchConfig, compose
from imagestitch_tpu.core import stream_out

OFFSET_CASES = [
    [(80, 3), (80, -2)],                         # linear strip
    [(100, 1), (-10, 120), (-95, -2)],           # serpentine row transition
    [(-50, 10), (30, -40)],                      # negative rebase both axes
    [(30, 40), (40, -30), (-30, 35)],            # corner overlaps
]


def _tiles(rng, offsets, shape, color=False):
    """Tiles cut from one base image so overlaps are consistent."""
    from oracle import placement_oracle
    pos, canvas, _, _ = placement_oracle(offsets, shape)
    base_shape = canvas + (3,) if color else canvas
    base = rng.integers(1, 255, base_shape, np.uint8)
    h, w = shape
    return np.stack([base[r:r + h, c:c + w] for r, c in pos])


@pytest.mark.parametrize("offsets", OFFSET_CASES)
@pytest.mark.parametrize("fuse", ["notFuse", "average", "fadeInAndFadeOut",
                                  "trigonometric"])
def test_streamed_equals_full_readback_gray(rng, offsets, fuse):
    shape = (120, 160)
    tiles = _tiles(rng, offsets, shape)
    cfg = StitchConfig(color_mode=False, fuse_method=fuse,
                       registration="phase_incre")
    full = compose(tiles, offsets, cfg)
    streamed = stream_out.compose_streamed(tiles, offsets, cfg)
    np.testing.assert_array_equal(streamed, full)


def test_streamed_multiband_gray(rng):
    offsets = [(80, 3)]
    shape = (128, 160)
    tiles = _tiles(rng, offsets, shape)
    cfg = StitchConfig(color_mode=False, fuse_method="multiBandBlending",
                       registration="phase_incre")
    full = compose(tiles, offsets, cfg)
    streamed = stream_out.compose_streamed(tiles, offsets, cfg)
    np.testing.assert_array_equal(streamed, full)


@pytest.mark.parametrize("offsets", OFFSET_CASES)
@pytest.mark.parametrize("fuse", ["fadeInAndFadeOut", "average",
                                  "trigonometric", "maximum"])
def test_color_host_matches_device_compose(rng, offsets, fuse):
    """Host f64 color composition vs the device f32 composer: equal up to
    the documented ±1-LSB f32 rounding divergence on blended pixels (the
    HOST result is the reference-exact one — ImageFusion.py:241-243
    promotes through float64)."""
    shape = (120, 160)
    tiles = _tiles(rng, offsets, shape, color=True)
    cfg = StitchConfig(color_mode=True, fuse_method=fuse,
                       registration="phase_incre")
    full = compose(tiles, offsets, cfg)
    host = stream_out.compose_color_host(tiles, offsets, cfg)
    diff = np.abs(host.astype(np.int32) - full.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    # the divergence touches only a small fraction of pixels (trig's sin^2
    # rounds differently in f32 more often than fade's linear ramps)
    assert (diff != 0).mean() < 5e-2


def test_stitcher_stream_output_matches_default():
    """End-to-end Stitcher with --stream-output == default, on real demo
    frames, gray (fused ingest keeps a host copy) AND color (host canvas)."""
    import os
    from conftest import REFERENCE_DEMO, has_demo_images
    if not has_demo_images():
        pytest.skip("reference demoImages not present")
    from imagestitch_tpu import Stitcher
    from imagestitch_tpu.io import dataset as ds
    files = ds.list_project_images(os.path.join(REFERENCE_DEMO, "iron"), 1)
    for color in (False, True):
        cfg = StitchConfig(registration="phase_incre", direction=1,
                           direct_incre=0, roi_ratio=0.2, color_mode=color,
                           fuse_method="fadeInAndFadeOut")
        base = Stitcher(cfg).stitch_files(files)
        streamed = Stitcher(cfg.replace(stream_output=True)).stitch_files(files)
        assert len(base) == len(streamed) == 1
        # --stream-output routes BOTH gray and color through the host f64
        # composer (reference-exact); the device f32 default may differ by
        # 1 LSB on a tiny blended-pixel fraction
        diff = np.abs(streamed[0].image.astype(np.int32)
                      - base[0].image.astype(np.int32))
        assert diff.max() <= 1 and (diff != 0).mean() < 1e-2


def test_stitcher_stream_output_feature_incre_gray():
    """The flagship ingest path (feature_incre, fused pipelined decode)
    retains host frames for the streamed assembler; the f64 host composer
    agrees with the device default to 1 LSB on a tiny fraction."""
    import os
    from conftest import REFERENCE_DEMO, has_demo_images
    if not has_demo_images():
        pytest.skip("reference demoImages not present")
    from imagestitch_tpu import Stitcher
    from imagestitch_tpu.io import dataset as ds
    files = ds.list_project_images(
        os.path.join(REFERENCE_DEMO, "dendriticCrystal"), 1)[:4]
    cfg = StitchConfig(registration="feature_incre", direction=1,
                       direct_incre=1, roi_ratio=0.2, color_mode=False,
                       fuse_method="fadeInAndFadeOut")
    base = Stitcher(cfg).stitch_files(files)
    streamed = Stitcher(cfg.replace(stream_output=True)).stitch_files(files)
    assert len(base) == len(streamed)
    for b, s in zip(base, streamed):
        diff = np.abs(s.image.astype(np.int32) - b.image.astype(np.int32))
        assert diff.max() <= 1 and (diff != 0).mean() < 1e-2


@pytest.mark.parametrize("offsets", OFFSET_CASES)
@pytest.mark.parametrize("fuse", ["fadeInAndFadeOut", "trigonometric"])
def test_compose_host_gray_matches_device(rng, offsets, fuse):
    """Gray host-native composition (f64 C kernels) vs the device f32
    composer: ±1 LSB on a small blended fraction (host is the
    reference-exact arithmetic)."""
    shape = (120, 160)
    tiles = _tiles(rng, offsets, shape)
    cfg = StitchConfig(color_mode=False, fuse_method=fuse,
                       registration="phase_incre")
    full = compose(tiles, offsets, cfg)
    host = stream_out.compose_host(tiles, offsets, cfg)
    diff = np.abs(host.astype(np.int32) - full.astype(np.int32))
    assert diff.max() <= 1, diff.max()
    # trig's sin^2 rounds differently in f32 more often than fade's ramps
    assert (diff != 0).mean() < 8e-2


def test_compose_host_positions_matches_device(rng):
    """Solver-path host composition (absolute positions) vs
    compose_from_positions: ±1 LSB bound, same accounting as the offsets
    path."""
    from imagestitch_tpu.core import compose as cm
    shape = (100, 140)
    positions = np.asarray([[0.0, 0.0], [70.2, 2.4], [139.8, -1.2]])
    base = rng.integers(1, 255, (320, 160), np.uint8)
    pos_i = np.round(positions).astype(int)
    pos_i -= pos_i.min(axis=0)
    tiles = np.stack([base[r:r + shape[0], c:c + shape[1]]
                      for r, c in pos_i])
    cfg = StitchConfig(color_mode=False, fuse_method="fadeInAndFadeOut",
                       registration="phase_incre")
    dev = cm.compose_from_positions(tiles, positions, cfg)
    host = stream_out.compose_host_positions(tiles, positions, cfg)
    diff = np.abs(host.astype(np.int32) - dev.astype(np.int32))
    assert diff.max() <= 1 and (diff != 0).mean() < 5e-2


def test_streamed_single_image(rng):
    tiles = rng.integers(1, 255, (1, 60, 80), np.uint8)
    cfg = StitchConfig(color_mode=False, fuse_method="fadeInAndFadeOut",
                       registration="phase_incre")
    streamed = stream_out.compose_streamed(tiles, [], cfg)
    np.testing.assert_array_equal(streamed, tiles[0])
