"""Fused Pallas select (doh_select) + band-streaming describe kernels
(interpret mode on CPU), validated against the XLA reference path."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagestitch_tpu import StitchConfig
from imagestitch_tpu.core import feature_registration as freg
from imagestitch_tpu.ops.features import describe, detect
from imagestitch_tpu.ops.pallas import describe as pdesc
from imagestitch_tpu.ops.pallas import doh


def _textured(rng, h, w, n=600):
    base = np.zeros((h, w), np.float32)
    ys, xs = rng.integers(5, h - 5, n), rng.integers(5, w - 5, n)
    for y, x, a in zip(ys, xs, rng.uniform(50, 200, n)):
        base[y - 2:y + 3, x - 2:x + 3] += a
    return np.clip(base, 0, 255)


def test_doh_select_matches_score_map():
    rng = np.random.default_rng(3)
    img = jnp.asarray(_textured(rng, 320, 400))
    score, raw = doh.doh_score_map(img, threshold=10.0, border=8,
                                   interpret=True)
    sc, col, drs, dcs = doh.doh_select(img, r_cands=4, threshold=10.0,
                                       border=8, interpret=True)
    score, raw = np.asarray(score), np.asarray(raw)
    sc, col = np.asarray(sc), np.asarray(col)
    drs, dcs = np.asarray(drs), np.asarray(dcs)
    for r in range(320):
        exp = np.sort(score[r])[::-1][:4]
        exp = np.where(exp > 0, exp, 0)
        got = np.sort(sc[r])[::-1]
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-4)
    # payload: subpixel offsets equal refine_subpixel on the raw map
    live = np.argwhere(sc > 0)
    rs = live[:, 0].astype(np.int32)
    cs = col[sc > 0].astype(np.int32)
    dr_ref, dc_ref = detect.refine_subpixel(jnp.asarray(raw),
                                            jnp.asarray(rs), jnp.asarray(cs))
    np.testing.assert_allclose(drs[sc > 0], np.asarray(dr_ref), atol=1e-5)
    np.testing.assert_allclose(dcs[sc > 0], np.asarray(dc_ref), atol=1e-5)


@pytest.mark.parametrize("extended", [True, False])
def test_describe_atlas_matches_describe_batch(extended):
    rng = np.random.default_rng(0)
    hp, wp = 2 * pdesc.BAND + pdesc.HALO, 512
    atlas = jnp.asarray(rng.random((hp, wp)).astype(np.float32) * 255)
    rows = jnp.asarray(np.sort(rng.uniform(12, hp - 12, 64)).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, wp - 1, 64).astype(np.float32))
    sp = describe.DescribeParams(
        family="surf-extended" if extended else "surf", upright=True)
    ref = np.asarray(describe.describe_batch(atlas[None], rows[None],
                                             cols[None], sp)[0])
    r0 = np.clip(np.round(np.asarray(rows)).astype(np.int32) - pdesc._MARGIN,
                 0, hp - pdesc._WIN)
    c0 = np.clip(np.round(np.asarray(cols)).astype(np.int32) - pdesc._MARGIN,
                 0, wp - pdesc._WIN)
    ca = np.clip((c0 // 128) * 128, 0, wp - pdesc._READ_W)
    rm = np.round(np.asarray(rows)).astype(np.int32)
    bs = np.searchsorted(rm, np.arange(3) * pdesc.BAND + pdesc._MARGIN + 1
                         ).astype(np.int32)
    out = np.asarray(pdesc.describe_atlas(
        atlas, jnp.asarray(r0), jnp.asarray(ca), jnp.asarray(c0 - ca),
        jnp.asarray(bs), extended=extended, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fused_pool_path_matches_xla_pyramid():
    """The full v2 pool stage (select kernel -> atlas describe kernel)
    reproduces the XLA pyramid descriptors at its selected candidates."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(_textured(rng, 600, 700, n=800))
    cfg = StitchConfig(registration="feature_incre", direction=1,
                       direct_incre=1, roi_ratio=0.2)
    cfg = cfg.replace(features=dataclasses.replace(cfg.features,
                                                   upright=True))
    params = freg._detect_params(cfg)
    sparams = freg._describe_params(cfg)
    rows, cols, sc, descs = freg._detect_describe_image_pallas_v2(
        img, params, sparams, interpret=True)
    rows, cols, sc, descs = map(np.asarray, (rows, cols, sc, descs))
    live = sc > 0
    assert live.sum() > 500
    # rebuild octave-local coords and cross-check via the XLA atlas path
    octs = []
    xo = img.astype(jnp.float32)
    for o in range(params.n_octaves):
        if o > 0:
            if min(xo.shape) < 256:
                break
            xo = detect._pool2(xo)
        octs.append(xo)
    r_loc, c_loc, oids = [], [], []
    k0 = 0
    for o, xoo in enumerate(octs):
        ho = xoo.shape[0]
        rc = freg._ROW_CANDS[min(o, len(freg._ROW_CANDS) - 1)]
        n = ho * rc
        f = float(1 << o)
        r_loc.append((rows[k0:k0 + n] - (f - 1) / 2) / f)
        c_loc.append((cols[k0:k0 + n] - (f - 1) / 2) / f)
        oids.append(np.full(n, o))
        k0 += n
    assert k0 == len(sc)
    ref = np.asarray(describe.describe_from_pyramid(
        octs, jnp.asarray(np.concatenate(r_loc)),
        jnp.asarray(np.concatenate(c_loc)),
        jnp.asarray(np.concatenate(oids)), sparams))
    np.testing.assert_allclose(descs[live], ref[live], atol=1e-5)


def test_fused_pool_registers_golden_pair(rng):
    """v2 pool feeds the replay and registers a synthetic translated pair
    with the exact known offset."""
    base = _textured(np.random.default_rng(9), 560, 420, n=900)
    a = base[:512, :]
    b = base[40:552, :]       # true offset (40, 0)
    imgs = np.stack([a, b]).astype(np.uint8)
    cfg = StitchConfig(registration="feature_incre", direction=1,
                       direct_incre=0, roi_ratio=0.2)
    cfg = cfg.replace(features=dataclasses.replace(cfg.features,
                                                   upright=True))
    params = freg._detect_params(cfg)
    sparams = freg._describe_params(cfg)
    pool = jax.lax.map(
        lambda im: freg._detect_describe_image_pallas_v2(
            im, params, sparams, interpret=True), jnp.asarray(imgs))
    recs = freg.replay_from_pool(pool, 2, (512, 420), cfg)
    assert recs[0].ok
    assert recs[0].offset == (40, 0)
