"""Pallas fused matcher vs the XLA reference path (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from imagestitch_tpu.ops.features import match
from imagestitch_tpu.ops.pallas import matcher


def test_top2_matches_xla_path(rng):
    ka, kb, d = 512, 384, 64
    da = jnp.asarray(rng.normal(0, 1, (ka, d)).astype(np.float32))
    db = jnp.asarray(rng.normal(0, 1, (kb, d)).astype(np.float32))
    valid_b = jnp.asarray(rng.uniform(size=kb) > 0.1)

    d0p, i0p, d1p = matcher.top2_l2(da, db, valid_b, interpret=True)

    dist = match._pairwise_sq_l2(da, db)
    dist = jnp.where(valid_b[None, :], dist, match._BIG)
    d0x, i0x, d1x = match._top2_min(dist)

    np.testing.assert_array_equal(np.asarray(i0p), np.asarray(i0x))
    np.testing.assert_allclose(np.asarray(d0p), np.asarray(d0x), rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(d1p), np.asarray(d1x), rtol=1e-5,
                               atol=1e-4)


def test_match_ratio_pallas_agrees(rng):
    ka, kb, d = 256, 256, 64
    base = rng.normal(0, 1, (kb, d)).astype(np.float32)
    # queries = perturbed train rows -> strong unambiguous matches
    perm = rng.permutation(kb)[:ka]
    da = jnp.asarray(base[perm] + rng.normal(0, 0.01, (ka, d)).astype(np.float32))
    db = jnp.asarray(base)
    va = jnp.ones(ka, bool)
    vb = jnp.ones(kb, bool)
    i_p, ok_p = matcher.match_ratio_pallas(da, db, va, vb, 0.75, interpret=True)
    i_x, ok_x = match.match_ratio(da, db, va, vb, 0.75)
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_x))
    np.testing.assert_array_equal(np.asarray(i_p)[np.asarray(ok_p)],
                                  np.asarray(i_x)[np.asarray(ok_x)])
    assert np.asarray(ok_p).mean() > 0.9


def test_doh_kernel_matches_xla_detector(rng):
    """Pallas DoH score map == XLA response+NMS+threshold stage."""
    import jax
    import jax.numpy as jnp
    from imagestitch_tpu.ops.pallas import doh
    from imagestitch_tpu.ops.features import detect

    img = rng.integers(0, 255, (300, 384), np.uint8)
    score_p, raw_p = doh.doh_score_map(jnp.asarray(img), threshold=10.0,
                                       interpret=True)
    score_p = np.asarray(score_p)
    x = jnp.asarray(img)[None].astype(jnp.float32)
    resp = detect.hessian_response(x, 1.2)
    for s in range(1, 3):
        resp = jnp.maximum(resp, detect.hessian_response(x, 1.2 * 1.6 ** s))
    np.testing.assert_allclose(np.asarray(raw_p), np.asarray(resp[0]),
                               rtol=1e-4, atol=1e-2)
    keep = detect._nms3(resp)[0]
    h, w = img.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (ri >= 8) & (ri < h - 8) & (ci >= 8) & (ci < w - 8)
    score_x = np.asarray(jnp.where(keep & inside & (resp[0] > 10.0),
                                   resp[0], 0.0))
    np.testing.assert_array_equal(score_p > 0, score_x > 0)
    np.testing.assert_allclose(score_p, score_x, rtol=1e-4, atol=1e-2)
