"""Enhancement ops vs the cv2 oracle."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax.numpy as jnp

from imagestitch_tpu.ops import enhance


def test_equalize_hist_matches_cv2(rng):
    img = rng.integers(0, 256, (64, 80), np.uint8)
    got = np.asarray(enhance.equalize_hist(jnp.asarray(img)))
    exp = cv2.equalizeHist(img)
    # rounding at bin edges may differ by 1 LSB
    assert np.abs(got.astype(int) - exp.astype(int)).max() <= 1


def test_equalize_constant_image():
    img = np.full((32, 32), 77, np.uint8)
    got = np.asarray(enhance.equalize_hist(jnp.asarray(img)))
    np.testing.assert_array_equal(got, img)


def test_clahe_close_to_cv2(rng):
    img = (rng.normal(128, 30, (100, 125)).clip(0, 255)).astype(np.uint8)
    got = np.asarray(enhance.clahe(jnp.asarray(img), clip_limit=20.0, tiles=5))
    cl = cv2.createCLAHE(clipLimit=20.0, tileGridSize=(5, 5))
    exp = cl.apply(img)
    # tile-border handling differs slightly; bulk must agree closely
    diff = np.abs(got.astype(int) - exp.astype(int))
    assert np.median(diff) <= 2
    assert (diff <= 8).mean() > 0.9
