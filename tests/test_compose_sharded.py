"""Sharded canvas composition == single-device composition, bit-exact."""
import numpy as np
import pytest

import jax

from imagestitch_tpu import StitchConfig, compose
from imagestitch_tpu.parallel.compose_sharded import compose_sharded
from imagestitch_tpu.parallel.mesh import make_mesh


def _tiles(rng, n, shape, step):
    h, w = shape
    base = rng.integers(1, 255, (step * n + h + 50, w + 60), np.uint8)
    tl = [(step * i + (i % 3), 2 * i) for i in range(n)]
    tiles = np.stack([base[r:r + h, c:c + w] for r, c in tl])
    offsets = [(tl[i + 1][0] - tl[i][0], tl[i + 1][1] - tl[i][1])
               for i in range(n - 1)]
    return tiles, offsets


@pytest.mark.parametrize("fuse", ["notFuse", "fadeInAndFadeOut", "average"])
def test_sharded_matches_single(rng, fuse):
    assert jax.device_count() >= 8
    tiles, offsets = _tiles(rng, 4, (96, 128), 64)
    cfg = StitchConfig(color_mode=False, fuse_method=fuse,
                       registration="phase_incre")
    single = compose(tiles, offsets, cfg)
    mesh = make_mesh(8, axis="blocks")
    sharded = compose_sharded(tiles, offsets, cfg, mesh)
    if fuse == "fadeInAndFadeOut":
        # f32 blend scheduling differs between the scan-grouped single-device
        # path and the shard_map path: +-1 LSB
        np.testing.assert_allclose(sharded.astype(int), single.astype(int),
                                   atol=1)
    else:
        np.testing.assert_array_equal(sharded, single)


def test_sharded_matches_single_color(rng):
    tiles, offsets = _tiles(rng, 3, (80, 100), 50)
    tiles = np.stack([np.stack([t, t // 2, t // 3], axis=-1) for t in tiles])
    cfg = StitchConfig(color_mode=True, fuse_method="fadeInAndFadeOut",
                       registration="phase_incre")
    single = compose(tiles, offsets, cfg)
    mesh = make_mesh(8, axis="blocks")
    sharded = compose_sharded(tiles, offsets, cfg, mesh)
    # XLA schedules the f32 blend differently under shard_map: +-1 LSB
    np.testing.assert_allclose(sharded.astype(int), single.astype(int), atol=1)


def test_sharded_serpentine_turn(rng):
    """Negative rebasing + corner-overlap fusion across block boundaries."""
    tiles, _ = _tiles(rng, 3, (96, 128), 60)
    offsets = [(60, 2), (-5, 100)]  # row transition with corner overlap
    cfg = StitchConfig(color_mode=False, fuse_method="fadeInAndFadeOut",
                       registration="phase_incre")
    single = compose(tiles, offsets, cfg)
    mesh = make_mesh(4, axis="blocks")
    sharded = compose_sharded(tiles, offsets, cfg, mesh)
    np.testing.assert_allclose(sharded.astype(int), single.astype(int), atol=1)


@pytest.mark.parametrize("fuse", ["multiBandBlending", "optimalSeamLine"])
def test_sharded_exact_rect_modes(rng, fuse):
    """Multiband / optimal-seam now run sharded (round-2 capability)."""
    tiles, offsets = _tiles(rng, 3, (96, 128), 64)
    cfg = StitchConfig(color_mode=False, fuse_method=fuse,
                       registration="phase_incre")
    single = compose(tiles, offsets, cfg)
    mesh = make_mesh(4, axis="blocks")
    sharded = compose_sharded(tiles, offsets, cfg, mesh)
    np.testing.assert_allclose(sharded.astype(int), single.astype(int),
                               atol=1)
