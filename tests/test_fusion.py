"""Fusion kernels vs the reference-semantics oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from imagestitch_tpu.ops.fusion import blend, weights
from oracle import corner_weights_oracle, fade_fuse_oracle, fade_weights_oracle


def _sentinel_region(rng, shape, kind):
    """Build a region with a -1 sentinel pattern typical of corner overlaps."""
    a = rng.integers(1, 255, shape).astype(np.int32)
    h, w = shape[:2]
    if kind == "upper_left_hole":
        a[:h // 3, :w // 3] = -1
    elif kind == "lower_right_hole":
        a[2 * h // 3:, 2 * w // 3:] = -1
    elif kind == "upper_band":
        a[:h // 4, :] = -1
    elif kind == "l_shape":
        a[:h // 2, :] = -1
        a[:, :w // 2] = -1
    return a


@pytest.mark.parametrize("kind", ["upper_left_hole", "lower_right_hole",
                                  "upper_band", "l_shape"])
def test_corner_weights_match_oracle(rng, kind):
    a = _sentinel_region(rng, (24, 30), kind)
    wa_o, wb_o = corner_weights_oracle(a, color=False)
    wa, wb = weights.corner_fade_weights(jnp.asarray(a), color=False)
    np.testing.assert_allclose(np.asarray(wb), wb_o, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wa), wa_o, atol=1e-5)


@pytest.mark.parametrize("shape", [(20, 12), (12, 20), (16, 16)])
@pytest.mark.parametrize("dr,dc", [(5, 3), (-5, 3), (5, -3), (-5, -3), (0, 0)])
def test_plain_fade_weights_match_oracle(shape, dr, dc):
    wa_o, wb_o = fade_weights_oracle(shape, dr, dc)
    wa, wb = weights.plain_fade_weights(shape, dr, dc)
    np.testing.assert_allclose(np.asarray(wa), wa_o, atol=1e-6)
    np.testing.assert_allclose(np.asarray(wb), wb_o, atol=1e-6)


@pytest.mark.parametrize("color", [False, True])
def test_fade_fuse_matches_oracle(rng, color):
    shape = (30, 22, 3) if color else (30, 22)
    a = rng.integers(0, 255, shape).astype(np.int32)
    b = rng.integers(0, 255, shape).astype(np.int32)
    a[:3] = -1  # partial sentinel band, still >65% valid
    got = blend.fuse_region(jnp.asarray(a), jnp.asarray(b), 5, 2,
                            "fadeInAndFadeOut", color)
    expect = fade_fuse_oracle(a, b, 5, 2, color)
    # float32 weight products vs the reference's float64 promotion: +-1 LSB
    np.testing.assert_allclose(np.asarray(got).astype(int), expect.astype(int),
                               atol=1)


@pytest.mark.parametrize("color", [False, True])
def test_fade_fuse_corner_case_matches_oracle(rng, color):
    shape = (30, 22, 3) if color else (30, 22)
    a = rng.integers(1, 255, shape).astype(np.int32)
    # large sentinel region -> corner path (<65% valid)
    a[:20, :] = -1
    b = rng.integers(1, 255, shape).astype(np.int32)
    got = blend.fuse_region(jnp.asarray(a), jnp.asarray(b), -10, 120,
                            "fadeInAndFadeOut", color)
    expect = fade_fuse_oracle(a, b, -10, 120, color)
    np.testing.assert_allclose(np.asarray(got).astype(int), expect.astype(int),
                               atol=1)


def test_simple_fusers(rng):
    a = rng.integers(0, 255, (16, 16)).astype(np.int32)
    b = rng.integers(0, 255, (16, 16)).astype(np.int32)
    a[0, 0] = -1
    b[1, 1] = -1
    # oracle: prefill then op
    ao = a.copy(); bo = b.copy()
    ao[ao == -1] = 0; bo[bo == -1] = 0
    ao[ao == 0] = bo[ao == 0]; bo[bo == 0] = ao[bo == 0]
    got_avg = blend.fuse_region(jnp.asarray(a), jnp.asarray(b), 1, 1,
                                "average", False)
    np.testing.assert_array_equal(np.asarray(got_avg),
                                  ((ao.astype(int) + bo) // 2).astype(np.uint8))
    got_max = blend.fuse_region(jnp.asarray(a), jnp.asarray(b), 1, 1,
                                "maximum", False)
    np.testing.assert_array_equal(np.asarray(got_max),
                                  np.maximum(ao, bo).astype(np.uint8))
    got_min = blend.fuse_region(jnp.asarray(a), jnp.asarray(b), 1, 1,
                                "minimum", False)
    np.testing.assert_array_equal(np.asarray(got_min),
                                  np.minimum(ao, bo).astype(np.uint8))


def test_reference_6x6_fixture():
    """The reference's own smoke fixture (ImageFusion.py:494-512)."""
    num = 6
    a1 = np.zeros((num, num), np.int32)
    a1[:, :3] = 1
    a1[:3, :] = 1
    a2 = np.ones((num, num), np.int32)
    got = blend.fuse_region(jnp.asarray(a1), jnp.asarray(a2), 1, 1,
                            "fadeInAndFadeOut", False)
    expect = fade_fuse_oracle(a1, a2, 1, 1, False)
    np.testing.assert_array_equal(np.asarray(got), expect)


def test_padded_fusion_equivalence(rng):
    """fuse_region_padded on a bucketed window == fuse_region on the true
    rect, and is a verbatim no-op outside it (composition relies on this to
    share one compiled program per shape bucket)."""
    geoms = [(17, 40, 32, 64), (40, 17, 48, 24)]
    for (rh, rw, bh, bw) in geoms:
        for color in (False, True):
            for rep in range(3):
                orow = int(rng.integers(0, bh - rh + 1))
                ocol = int(rng.integers(0, bw - rw + 1))
                shp = (rh, rw, 3) if color else (rh, rw)
                a = rng.integers(-1, 256, shp).astype(np.int32)
                b = rng.integers(-1, 256, shp).astype(np.int32)
                if rep % 2:  # invalid corner triggers getWeightsMatrix path
                    a[:int(rng.integers(1, rh)), :int(rng.integers(1, rw))] = -1
                drow = int(rng.integers(-50, 50))
                dcol = int(rng.integers(-50, 50))
                pshp = (bh, bw, 3) if color else (bh, bw)
                ap = rng.integers(-1, 256, pshp).astype(np.int32)
                bp = rng.integers(-1, 256, pshp).astype(np.int32)
                ap[orow:orow + rh, ocol:ocol + rw] = a
                bp[orow:orow + rh, ocol:ocol + rw] = b
                for method in ("average", "maximum", "minimum", "notFuse",
                               "fadeInAndFadeOut", "trigonometric"):
                    ref = np.asarray(blend.fuse_region(
                        jnp.asarray(a), jnp.asarray(b), drow, dcol,
                        method, color))
                    pad = np.asarray(blend.fuse_region_padded(
                        jnp.asarray(ap), jnp.asarray(bp),
                        jnp.int32(drow), jnp.int32(dcol), jnp.int32(orow),
                        jnp.int32(ocol), jnp.int32(rh), jnp.int32(rw),
                        method, color))
                    inner = pad[orow:orow + rh, ocol:ocol + rw]
                    if method in ("fadeInAndFadeOut", "trigonometric"):
                        # float weights: XLA constant-folds the static
                        # version's 1/len divide -> +-1 LSB on .5 boundaries
                        d = np.abs(inner.astype(np.int64) -
                                   ref.astype(np.int64))
                        assert d.max() <= 1, (method, color, d.max())
                    else:
                        np.testing.assert_array_equal(
                            inner.astype(np.int32), ref.astype(np.int32),
                            err_msg=f"{method} color={color}")
                    mask = np.zeros((bh, bw), bool)
                    mask[orow:orow + rh, ocol:ocol + rw] = True
                    np.testing.assert_array_equal(pad[~mask], bp[~mask])
