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
