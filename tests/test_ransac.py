"""Homography-RANSAC oracle tests vs cv2.findHomography (reference
ImageUtility.py:180-210 semantics: threshold 3, inliers >= offsetEvaluate,
offset = (-int(H[1,2]), -int(H[0,2])))."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from imagestitch_tpu.ops.features import ransac


def _synthetic_matches(rng, n_good, n_out, t_row, t_col, jitter=0.3,
                       k=64):
    """Matched (row, col) sets: translation + jitter inliers, uniform
    outliers, padded to capacity ``k`` with invalid slots."""
    ra = rng.uniform(50, 950, n_good + n_out).astype(np.float32)
    ca = rng.uniform(50, 950, n_good + n_out).astype(np.float32)
    rb = np.empty_like(ra)
    cb = np.empty_like(ca)
    rb[:n_good] = ra[:n_good] + t_row + rng.normal(0, jitter, n_good)
    cb[:n_good] = ca[:n_good] + t_col + rng.normal(0, jitter, n_good)
    rb[n_good:] = rng.uniform(0, 1000, n_out)
    cb[n_good:] = rng.uniform(0, 1000, n_out)
    pad = k - (n_good + n_out)
    z = np.zeros(pad, np.float32)
    valid = np.concatenate([np.ones(n_good + n_out, bool),
                            np.zeros(pad, bool)])
    return (np.concatenate([ra, z]), np.concatenate([ca, z]),
            np.concatenate([rb, z]), np.concatenate([cb, z]), valid)


def _cv2_reference(ra, ca, rb, cb, valid, evaluate=3):
    """The reference's getOffsetByRansac decision + offset on the same
    matches (ptsA = (x, y) = (col, row))."""
    pa = np.stack([ca[valid], ra[valid]], axis=1).astype(np.float32)
    pb = np.stack([cb[valid], rb[valid]], axis=1).astype(np.float32)
    H, status = cv2.findHomography(pa, pb, cv2.RANSAC, 3)
    n_inl = int(status.sum())
    if n_inl < evaluate or H is None:
        return False, (0, 0), n_inl
    Hi = H.astype(np.int64)           # np.int truncation of the reference
    return True, (int(-Hi[1, 2]), int(-Hi[0, 2])), n_inl


# fractional true offsets keep both estimators well inside one truncation
# bin (an exactly-integer offset makes int() flip on the estimation noise)
@pytest.mark.parametrize("t", [(137.4, -42.6), (-260.3, 3.4), (15.6, 900.4)])
@pytest.mark.parametrize("outlier_frac", [0.0, 0.3, 0.5])
def test_matches_cv2_offsets(rng, t, outlier_frac):
    n_total = 48
    n_out = int(n_total * outlier_frac)
    ra, ca, rb, cb, valid = _synthetic_matches(
        rng, n_total - n_out, n_out, *t)
    dr, dc, n, ok, sr, sc = ransac.ransac_homography_batch(
        ra[None], ca[None], rb[None], cb[None], valid[None])
    ok_ref, off_ref, n_ref = _cv2_reference(ra, ca, rb, cb, valid)
    assert bool(ok[0]) and ok_ref
    # integer-truncated offsets must agree (both estimates are sub-0.5 px
    # from truth on this data; truncation can differ only at exact-integer
    # boundaries, which jitter=0.3 keeps us away from)
    assert (int(dr[0]), int(dc[0])) == off_ref, (t, outlier_frac, n_ref)
    # inlier counts in the same ballpark (different RNGs)
    assert abs(int(n[0]) - n_ref) <= max(3, int(0.15 * n_ref))


def test_outliers_rejected_translation_recovered(rng):
    """50% structured outliers (a competing smaller cluster): RANSAC must
    lock to the majority plane, unlike a mean/LS fit."""
    ra, ca, rb, cb, valid = _synthetic_matches(rng, 30, 0, 100, 50, k=64)
    # competing cluster: 15 matches at a different offset
    rb[30:45] = ra[30:45] - 777
    cb[30:45] = ca[30:45] + 123
    valid[30:45] = True
    dr, dc, n, ok, _, _ = ransac.ransac_homography_batch(
        ra[None], ca[None], rb[None], cb[None], valid[None])
    assert bool(ok[0])
    assert abs(int(dr[0]) + 100) <= 1 and abs(int(dc[0]) + 50) <= 1
    assert 25 <= int(n[0]) <= 33


def test_too_few_matches_fails():
    z = np.zeros(16, np.float32)
    valid = np.zeros(16, bool)
    valid[:3] = True
    dr, dc, n, ok, _, _ = ransac.ransac_homography_batch(
        z[None], z[None], z[None], z[None], valid[None])
    assert int(n[0]) == 0 and not bool(ok[0])


def test_ransac_knob_registers_demo_pair():
    """offsetCaculate="ransac" end-to-end through the incremental search on
    a real dendritic pair, against the REFERENCE estimator run live: cv2
    SIFT on the scale-1 strips + cv2.findHomography(RANSAC, 3) in strip
    coords + margin (reference Stitcher.py:336-361 + ImageUtility.py:198).
    Note the homography estimator's scale term biases its translation ~2 px
    off the golden mode-vote chain value (1809, 2) — matching the reference
    estimator, not the golden, is the parity claim here."""
    import os
    from conftest import REFERENCE_DEMO, has_demo_images
    if not has_demo_images():
        pytest.skip("reference demoImages not present")
    from imagestitch_tpu import StitchConfig
    from imagestitch_tpu.core import feature_registration as freg
    a = cv2.imread(os.path.join(REFERENCE_DEMO,
                                "dendriticCrystal/1/1-003.jpg"), 0)
    b = cv2.imread(os.path.join(REFERENCE_DEMO,
                                "dendriticCrystal/1/1-004.jpg"), 0)
    cfg = StitchConfig(registration="feature_incre", direction=1,
                       direct_incre=1, roi_ratio=0.2,
                       offset_calculate="ransac")
    recs = freg.register_sequence_features_incre(np.stack([a, b]), cfg)
    assert recs[0].ok

    # live cv2 reference on the same strips
    h, w = a.shape
    L = int(np.floor(h * 0.2))
    ra_s, rb_s = a[h - L:, :], b[:L, :]
    sift = cv2.SIFT_create()
    bf = cv2.BFMatcher()
    ka, da = sift.detectAndCompute(ra_s, None)
    kb, db = sift.detectAndCompute(rb_s, None)
    good = [(m[0].trainIdx, m[0].queryIdx) for m in bf.knnMatch(da, db, 2)
            if len(m) == 2 and m[0].distance < 0.75 * m[1].distance]
    pa = np.float32([ka[q].pt for (_, q) in good])
    pb = np.float32([kb[t].pt for (t, _) in good])
    H, status = cv2.findHomography(pa, pb, cv2.RANSAC, 3)
    ref = (-int(H[1, 2]) + (h - L), -int(H[0, 2]))
    dr, dc = recs[0].offset
    assert abs(dr - ref[0]) <= 1 and abs(dc - ref[1]) <= 1, (recs[0], ref)


def test_batched_pairs_independent(rng):
    """Each pair in the batch gets its own estimate."""
    sets = [_synthetic_matches(rng, 40, 8, 100 * (i + 1), -10 * i)
            for i in range(3)]
    ra = np.stack([s[0] for s in sets])
    ca = np.stack([s[1] for s in sets])
    rb = np.stack([s[2] for s in sets])
    cb = np.stack([s[3] for s in sets])
    v = np.stack([s[4] for s in sets])
    dr, dc, n, ok, _, _ = ransac.ransac_homography_batch(ra, ca, rb, cb, v)
    for i in range(3):
        assert bool(ok[i])
        assert abs(int(dr[i]) + 100 * (i + 1)) <= 1
        assert abs(int(dc[i]) - 10 * i) <= 1
