"""Host float64 fusion (ops/fusion/host_blend.py) vs the literal oracle.

host_blend is the reference-exact arithmetic path (float64, as
ImageFusion.py promotes); the oracle re-states the reference's loops
literally, so agreement here must be EXACT, not toleranced.
"""
import numpy as np
import pytest

from imagestitch_tpu.ops.fusion import host_blend
from oracle import corner_weights_oracle, fade_fuse_oracle


def _corner_region(rng, kind, shape=(60, 80), color=False):
    """A region whose valid content sits in one corner (quadrant case)."""
    h, w = shape
    full = (h, w, 3) if color else (h, w)
    a = np.full(full, -1, np.int64)
    rh, rw = int(h * 0.55), int(w * 0.55)
    block = rng.integers(1, 255, (rh, rw, 3) if color else (rh, rw), np.int64)
    if kind == "ul":
        a[:rh, :rw] = block
    elif kind == "ur":
        a[:rh, w - rw:] = block
    elif kind == "ll":
        a[h - rh:, :rw] = block
    else:
        a[h - rh:, w - rw:] = block
    return a


@pytest.mark.parametrize("kind", ["ul", "ur", "ll", "lr"])
def test_corner_weights_match_oracle_exact(rng, kind):
    a = _corner_region(rng, kind)
    wa, wb = host_blend.corner_fade_weights_np(a, color=False)
    wa_o, wb_o = corner_weights_oracle(a, color=False)
    np.testing.assert_array_equal(wb, np.asarray(wb_o, np.float64))
    np.testing.assert_array_equal(wa, np.asarray(wa_o, np.float64))


@pytest.mark.parametrize("color", [False, True])
@pytest.mark.parametrize("case", ["plain", "corner"])
def test_fade_fuse_matches_oracle_exact(rng, color, case):
    shape = (60, 80, 3) if color else (60, 80)
    if case == "plain":
        a = rng.integers(1, 255, shape, np.int64)
        dr, dc = 5, 2
    else:
        a = _corner_region(rng, "ul", color=color)
        dr, dc = -10, 120
    b = rng.integers(1, 255, shape, np.int64)
    got = host_blend.fuse_region_np(a.astype(np.int32), b.astype(np.int32),
                                    dr, dc, "fadeInAndFadeOut", color)
    expect = fade_fuse_oracle(a, b, dr, dc, color)
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("method", ["average", "maximum", "minimum"])
def test_simple_fusers_match_device_semantics(rng, method):
    import jax.numpy as jnp
    from imagestitch_tpu.ops.fusion import blend
    a = rng.integers(-1, 255, (40, 50), np.int64).astype(np.int32)
    b = rng.integers(-1, 255, (40, 50), np.int64).astype(np.int32)
    got = host_blend.fuse_region_np(a, b, 1, 1, method, False)
    dev = np.asarray(blend.fuse_region(jnp.asarray(a), jnp.asarray(b),
                                       1, 1, method, False))
    np.testing.assert_array_equal(got, dev)


@pytest.mark.parametrize("color", [False, True])
@pytest.mark.parametrize("case", ["plain", "corner"])
def test_native_blend_matches_numpy(rng, color, case):
    """The C isr_blend_rect kernel vs the numpy f64 fallback: fade must be
    bit-identical (same IEEE double expressions); trig within 1 LSB (sin
    implementations may round differently)."""
    from imagestitch_tpu.io import native_loader
    if native_loader.get_lib() is None:
        pytest.skip("native runtime unavailable")
    shape = (80, 100, 3) if color else (80, 100)
    if case == "plain":
        a = rng.integers(1, 255, shape, np.int64)
        dr, dc = 5, 2
    else:
        a = _corner_region(rng, "lr", shape[:2], color=color)
        dr, dc = -10, 120
    b = rng.integers(1, 255, shape, np.int64)
    for method, exact in (("fadeInAndFadeOut", True),
                          ("trigonometric", False)):
        nat = host_blend.fuse_region_np(a.astype(np.int32),
                                        b.astype(np.int32), dr, dc,
                                        method, color, use_native=True)
        ref = host_blend.fuse_region_np(a.astype(np.int32),
                                        b.astype(np.int32), dr, dc,
                                        method, color, use_native=False)
        if exact:
            np.testing.assert_array_equal(nat, ref)
        else:
            assert np.abs(nat.astype(int) - ref.astype(int)).max() <= 1


def test_trig_matches_device_within_lsb(rng):
    import jax.numpy as jnp
    from imagestitch_tpu.ops.fusion import blend
    a = rng.integers(1, 255, (60, 80), np.int64).astype(np.int32)
    b = rng.integers(1, 255, (60, 80), np.int64).astype(np.int32)
    got = host_blend.fuse_region_np(a, b, 5, 2, "trigonometric", False)
    dev = np.asarray(blend.fuse_region(jnp.asarray(a), jnp.asarray(b),
                                       5, 2, "trigonometric", False))
    assert np.abs(got.astype(int) - dev.astype(int)).max() <= 1


def test_native_rect_stats_match_numpy(rng):
    """isr_rect_stats (one-pass C) vs the numpy reductions it replaces:
    quadrant positive counts, per-column valid bounds, valid-element count
    — on a canvas rect with sentinels, for gray and color."""
    import ctypes

    from imagestitch_tpu.io import native_loader
    lib = native_loader.get_lib()
    if lib is None:
        pytest.skip("native runtime unavailable")
    for ch in (1, 3):
        shape = (64, 80, ch) if ch == 3 else (64, 80)
        canvas = rng.integers(-1, 255, shape, np.int64).astype(np.int16)
        rr0, rc0, rh, rw = 7, 9, 40, 60
        quad = np.zeros(4, np.longlong)
        first_v = np.zeros(rw, np.int32)
        last_v = np.zeros(rw, np.int32)
        npos = np.zeros(1, np.longlong)
        i16p = ctypes.POINTER(ctypes.c_int16)
        lib.isr_rect_stats(
            canvas.ctypes.data_as(i16p), canvas.shape[1], ch,
            rr0, rc0, rh, rw,
            quad.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            first_v.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            last_v.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            npos.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)))
        rect = canvas[rr0:rr0 + rh, rc0:rc0 + rw]
        pos = rect > 0
        hr, hc = rh // 2, rw // 2
        exp_quad = [np.count_nonzero(pos[:hr, :hc]),
                    np.count_nonzero(pos[hr:, :hc]),
                    np.count_nonzero(pos[hr:, hc:]),
                    np.count_nonzero(pos[:hr, hc:])]
        np.testing.assert_array_equal(quad, exp_quad)
        valid = host_blend._valid_np(rect, ch == 3)
        any_col = valid.any(axis=0)
        exp_first = np.where(any_col, np.argmax(valid, axis=0), -1)
        exp_last = np.where(any_col,
                            (rh - 1) - np.argmax(valid[::-1], axis=0), -1)
        np.testing.assert_array_equal(first_v, exp_first)
        np.testing.assert_array_equal(last_v, exp_last)
        assert int(npos[0]) == int(np.count_nonzero(rect > -1))
