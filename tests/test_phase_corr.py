"""Phase-correlation kernel parity vs the cv2 oracle."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from imagestitch_tpu.ops import phase_corr


def _textured(rng, shape, sigma=1.0):
    img = rng.uniform(0, 255, shape)
    return cv2.GaussianBlur(img, (0, 0), sigma)


def test_optimal_dft_size_matches_cv2():
    for n in [1, 2, 3, 7, 16, 100, 127, 387, 401, 640, 1162, 1936, 2584, 4099]:
        assert phase_corr.optimal_dft_size(n) == cv2.getOptimalDFTSize(n)


@pytest.mark.parametrize("shift", [(0, 0), (7, -13), (-25, 31), (40, 2), (3, 100)])
def test_matches_cv2_on_synthetic(rng, shift):
    dr, dc = shift
    base = _textured(rng, (600, 800))
    r0, c0, h, w = 200, 250, 180, 300
    a = base[r0:r0 + h, c0:c0 + w]
    b = base[r0 + dr:r0 + dr + h, c0 + dc:c0 + dc + w]
    (x_cv, y_cv), resp_cv = cv2.phaseCorrelate(a, b)
    sx, sy, resp = phase_corr.phase_correlate_batch(a[None], b[None])
    assert abs(sx[0] - x_cv) < 2e-3
    assert abs(sy[0] - y_cv) < 2e-3
    assert abs(resp[0] - resp_cv) < 2e-3
    # and the true shift is recovered
    assert round(float(sx[0])) == -dc
    assert round(float(sy[0])) == -dr


def test_batch_consistency(rng):
    """vmapped batch == per-pair results."""
    base = _textured(rng, (400, 500))
    pairs = []
    for dr, dc in [(5, 0), (-11, 3), (0, 27)]:
        a = base[100:250, 100:300]
        b = base[100 + dr:250 + dr, 100 + dc:300 + dc]
        pairs.append((a, b))
    A = np.stack([p[0] for p in pairs])
    B = np.stack([p[1] for p in pairs])
    sx, sy, resp = phase_corr.phase_correlate_batch(A, B)
    for k, (a, b) in enumerate(pairs):
        sx1, sy1, r1 = phase_corr.phase_correlate_batch(a[None], b[None])
        assert abs(sx[k] - sx1[0]) < 1e-4
        assert abs(sy[k] - sy1[0]) < 1e-4
        assert abs(resp[k] - r1[0]) < 1e-4
