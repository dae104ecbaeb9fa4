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


def test_coords_matcher_matches_gather_path(rng):
    """match_batch_coords (in-kernel matched-coordinate extraction) equals
    match_batch + rows_b[train_idx] gathers, on both backends' paths."""
    import jax.numpy as jnp
    from imagestitch_tpu.ops.features import match
    from imagestitch_tpu.ops.pallas import matcher as pm

    p, k, d = 3, 256, 64
    da = jnp.asarray(rng.normal(size=(p, k, d)).astype(np.float32))
    db = jnp.asarray(rng.normal(size=(p, k, d)).astype(np.float32))
    va = jnp.asarray(rng.random((p, k)) > 0.1)
    vb = jnp.asarray(rng.random((p, k)) > 0.1)
    rb = jnp.asarray(rng.uniform(0, 500, (p, k)).astype(np.float32))
    cb = jnp.asarray(rng.uniform(0, 700, (p, k)).astype(np.float32))
    ti, ok = match.match_batch(da, db, va, vb, 0.9, 1e9, "l2")
    # XLA fallback coords path
    ti2, ok2, rbs, cbs = match.match_batch_coords(
        da, db, va, vb, rb, cb, 0.9, 1e9, "l2", use_pallas=False)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(ti2))
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok2))
    exp_rb = np.take_along_axis(np.asarray(rb), np.asarray(ti), axis=-1)
    np.testing.assert_array_equal(np.asarray(rbs), exp_rb)
    # Pallas kernel (interpret) coords
    i0, okp, rbs_p, cbs_p = pm.match_ratio_pallas_coords(
        da[0], db[0], va[0], vb[0], rb[0], cb[0], 0.9, interpret=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(ti)[0])
    np.testing.assert_array_equal(np.asarray(okp), np.asarray(ok)[0])
    np.testing.assert_allclose(np.asarray(rbs_p), exp_rb[0], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cbs_p),
        np.take_along_axis(np.asarray(cb), np.asarray(ti), -1)[0], atol=1e-5)
