"""Pyramid engine + multiband + optimal-seam vs cv2/reference semantics."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax.numpy as jnp

from imagestitch_tpu.ops.fusion import pyramid, seam


def test_pyr_down_matches_cv2(rng):
    img = rng.uniform(0, 255, (64, 80)).astype(np.float64)
    got = np.asarray(pyramid.pyr_down(jnp.asarray(img, jnp.float32)))
    exp = cv2.pyrDown(img)
    assert got.shape == exp.shape
    # interior must match closely; cv2 border scheme differs at the edge
    np.testing.assert_allclose(got[2:-2, 2:-2], exp[2:-2, 2:-2], atol=0.05)


def test_pyr_up_matches_cv2(rng):
    img = rng.uniform(0, 255, (32, 40)).astype(np.float64)
    got = np.asarray(pyramid.pyr_up(jnp.asarray(img, jnp.float32)))
    exp = cv2.pyrUp(img)
    assert got.shape == exp.shape
    np.testing.assert_allclose(got[4:-4, 4:-4], exp[4:-4, 4:-4], atol=0.05)


def test_multiband_preserves_constant():
    a = np.full((64, 96), 120, np.int32)
    b = np.full((64, 96), 120, np.int32)
    out = np.asarray(pyramid.fuse_multiband(jnp.asarray(a), jnp.asarray(b)))
    assert np.abs(out.astype(int) - 120).max() <= 1


def test_multiband_blends_midtone(rng):
    a = rng.integers(1, 255, (64, 96)).astype(np.int32)
    b = rng.integers(1, 255, (64, 96)).astype(np.int32)
    out = np.asarray(pyramid.fuse_multiband(jnp.asarray(a), jnp.asarray(b)))
    mean_expect = (a + b) / 2
    # multiband of the 0.5/0.5 per-level blend approximates the average
    assert np.abs(out.astype(float) - mean_expect).mean() < 12


def test_seam_dp_straight_valley():
    """Energy with a zero-cost column -> seam follows it exactly."""
    rows, cols = 20, 15
    value = np.full((rows, cols), 100.0, np.float32)
    value[:, 7] = 0.0
    mask = np.asarray(seam.find_optimal_seam(jnp.asarray(value)))
    # reference convention: mask[i, index:] = 1 from the seam column right,
    # rows 1..rows-1 written, row 0 untouched
    assert mask[0].sum() == 0
    for i in range(1, rows):
        assert mask[i, 7:].all() and not mask[i, :7].any()


def test_seam_dp_diagonal_valley():
    rows, cols = 12, 12
    value = np.full((rows, cols), 50.0, np.float32)
    for i in range(rows):
        value[i, min(i, cols - 1)] = 0.0
    mask = np.asarray(seam.find_optimal_seam(jnp.asarray(value)))
    # each row's transition point moves by at most 1 (3-neighbor DP)
    starts = [int(np.argmax(mask[i])) if mask[i].any() else cols
              for i in range(1, rows)]
    diffs = np.abs(np.diff(starts))
    assert (diffs <= 1).all()


def test_fuse_optimal_seam_runs(rng):
    a = rng.integers(1, 255, (48, 64)).astype(np.int32)
    b = rng.integers(1, 255, (48, 64)).astype(np.int32)
    out = np.asarray(seam.fuse_optimal_seam(jnp.asarray(a), jnp.asarray(b)))
    assert out.shape == (48, 64) and out.dtype == np.uint8
    assert out.std() > 0
