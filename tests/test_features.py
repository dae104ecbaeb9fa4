"""Feature pipeline: detector repeatability, matcher, mode vote vs oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from imagestitch_tpu import StitchConfig, FeatureConfig
from imagestitch_tpu.core import feature_registration as freg
from imagestitch_tpu.ops.features import detect, describe, match, vote
from oracle import mode_offset_oracle


def _textured(rng, shape, blobs=300):
    """Random blob field — repeatable structure for detection."""
    img = np.zeros(shape, np.float32)
    ys = rng.integers(5, shape[0] - 5, blobs)
    xs = rng.integers(5, shape[1] - 5, blobs)
    amps = rng.uniform(50, 200, blobs)
    for y, x, a in zip(ys, xs, amps):
        img[y - 2:y + 3, x - 2:x + 3] += a
    img = np.clip(img + rng.normal(0, 5, shape), 0, 255)
    return img.astype(np.uint8)


def test_mode_vote_matches_oracle(rng):
    """Vote kernel == reference getOffsetByMode on random match sets."""
    for trial in range(20):
        k = 64
        n_matches = int(rng.integers(0, k))
        kps_a = rng.uniform(0, 500, (k, 2)).astype(np.float32)  # (x, y)
        kps_b = rng.uniform(0, 500, (k, 2)).astype(np.float32)
        # make many matches share a common displacement
        common = rng.integers(-100, 100, 2)
        matches = []
        for i in range(n_matches):
            q = int(rng.integers(0, k))
            t = int(rng.integers(0, k))
            if rng.uniform() < 0.6:
                kps_b[t] = kps_a[q] - np.array(
                    [common[1], common[0]], np.float32) - rng.uniform(0, 0.4, 2)
            matches.append((t, q))
        ok_o, off_o = mode_offset_oracle(kps_a, kps_b, matches, 3)

        d_row = np.zeros(k, np.int32)
        d_col = np.zeros(k, np.int32)
        valid = np.zeros(k, bool)
        # jam the matches into fixed slots in order (slot order = match order)
        for slot, (t, q) in enumerate(matches[:k]):
            pa = (kps_a[q][1], kps_a[q][0])
            pb = (kps_b[t][1], kps_b[t][0])
            d_row[slot] = int(pa[0] - pb[0])
            d_col[slot] = int(pa[1] - pb[1])
            valid[slot] = True
        dr, dc, n, _ = vote.mode_vote_batch(jnp.asarray(d_row)[None],
                                            jnp.asarray(d_col)[None],
                                            jnp.asarray(valid)[None])
        got_ok = bool(n[0] >= 3)
        assert got_ok == ok_o, (trial, int(n[0]), off_o)
        if ok_o:
            assert (int(dr[0]), int(dc[0])) == tuple(off_o), trial


def test_detector_repeatable_under_translation(rng):
    base = _textured(rng, (400, 600))
    a = base[50:350, 60:500]
    b = base[80:380, 35:475]  # shifted (30, -25)
    rows, cols, scores = detect.detect_batch(
        jnp.asarray(np.stack([a, b])), 256,
        detect.DetectParams(threshold=10.0))
    rows, cols, scores = map(np.asarray, (rows, cols, scores))
    # content at base(R, C): in a at (R-50, C-60), in b at (R-80, C-35)
    ka = set(zip(np.round(rows[0] - 30).astype(int),
                 np.round(cols[0] + 25).astype(int)))
    kb = set(zip(np.round(rows[1]).astype(int),
                 np.round(cols[1]).astype(int)))
    # at least half of A's keypoints reappear at the translated position +-0
    inter = len(ka & kb)
    assert inter > 0.4 * min((scores[0] > 0).sum(), (scores[1] > 0).sum())


@pytest.mark.parametrize("method", ["surf", "sift", "orb"])
def test_feature_registration_recovers_translation(rng, method):
    """End-to-end synthetic check: known integer offsets recovered exactly."""
    base = _textured(rng, (800, 500), blobs=2500)
    h, w = 256, 384
    tl = [(0, 0), (180, 7), (360, 3)]
    images = np.stack([base[r:r + h, c:c + w] for r, c in tl])
    cfg = StitchConfig(
        registration="feature_incre", direction=1, direct_incre=0,
        roi_ratio=0.4, offset_evaluate=3,
        features=FeatureConfig(method=method, max_keypoints=512,
                               hessian_threshold=10.0))
    recs = freg.register_sequence_features_incre(images, cfg)
    assert [r.ok for r in recs] == [True, True]
    assert recs[0].offset == (180, 7)
    assert recs[1].offset == (180, -4)


def test_whole_image_feature_registration(rng):
    base = _textured(rng, (900, 400), blobs=2000)
    h, w = 256, 300
    tl = [(0, 0), (150, 5), (300, 2), (450, 0)]
    images = np.stack([base[r:r + h, c:c + w] for r, c in tl])
    cfg = StitchConfig(
        registration="feature", direction=1, direct_incre=0,
        offset_evaluate=3,
        features=FeatureConfig(method="surf", max_keypoints=512,
                               hessian_threshold=10.0))
    recs = freg.register_sequence_features(images, cfg)
    assert [r.ok for r in recs] == [True, True, True]
    assert recs[0].offset == (150, 5)
    assert recs[1].offset == (150, -3)
    assert recs[2].offset == (150, -2)
