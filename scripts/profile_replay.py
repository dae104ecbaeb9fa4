"""Replay decomposition: where do the 0.94 s go?

The replay issues 2 dispatches (big sweep: 4 directions x scale 1 for all
pairs; stragglers: all remaining configs).  Per attempt-side it runs
top_k(P -> k_sel) strip selection, the MXU/Pallas matcher, and the
sort-based exact mode vote.  This times each in isolation on the real pool.
"""
import dataclasses, functools, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from imagestitch_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from imagestitch_tpu import StitchConfig
from imagestitch_tpu.core import feature_registration as freg
from imagestitch_tpu.io import dataset
from imagestitch_tpu.ops.features import match, vote

files = dataset.list_project_images(
    "/root/reference/demoImages/dendriticCrystal", 1)
batch = dataset.load_batch(files, color_mode=False)
gray = jnp.concatenate([jax.device_put(batch.gray[s:s + 8])
                        for s in range(0, len(files), 8)])
np.asarray(gray[:1, :1, :1].astype(jnp.float32).sum())
cfg = StitchConfig(registration="feature_incre", direction=1, direct_incre=1,
                   roi_ratio=0.2, color_mode=False)
cfg = cfg.replace(features=dataclasses.replace(cfg.features, upright=True))
pool = freg._precompute_pool(gray, cfg)
rows, cols, scores, descs = pool
np.asarray(scores[:1, :1])
n, h, w = batch.gray.shape
P = rows.shape[1]
print("pool", rows.shape, descs.shape, flush=True)


def fence(x):
    for l in jax.tree_util.tree_leaves(x):
        np.asarray(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32)))


def best_of(f, *args, nrep=3, name=""):
    best = 1e9
    for _ in range(nrep):
        t0 = time.time()
        fence(f(*args))
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1000:.1f} ms", flush=True)
    return best


idx = jnp.arange(128, dtype=jnp.int32) % (n - 1)
k_sel = 1024
b1 = freg._strip_bounds(1, "first", 0.2, h, w)
b2 = freg._strip_bounds(1, "second", 0.2, h, w)

# 1. full one-config attempt (the unit the big sweep runs 4x)
f_full = jax.jit(functools.partial(
    freg._pool_attempt_jit, bounds_a=b1, bounds_b=b2, k_sel=k_sel,
    metric="l2", search_ratio=0.75, max_distance=1e9, vote_method="mode",
    use_pallas=True))
best_of(f_full, rows, cols, scores, descs, idx, name="attempt_1config_128p")


# 2. strip top_k side selection only
@jax.jit
def side_only(rows, cols, scores, descs, idx):
    r = rows[idx]
    c = cols[idx]
    s = scores[idx]
    r0, r1, c0, c1 = b1
    m = (s > 0) & (r >= r0) & (r < r1) & (c >= c0) & (c < c1)
    sel = jnp.where(m, s, -1.0)
    top_s, top_i = jax.lax.top_k(sel, k_sel)
    take = lambda x: jnp.take_along_axis(x, top_i, axis=-1)
    return (take(r), take(c), top_s > 0,
            jnp.take_along_axis(descs[idx], top_i[..., None], axis=-2))

best_of(side_only, rows, cols, scores, descs, idx, name="side_topk_128p")
ra, ca_, va, da = side_only(rows, cols, scores, descs, idx)
fence((ra, da))

# 3. matcher only
f_match = jax.jit(functools.partial(match.match_batch, ratio=0.75,
                                    max_distance=1e9, metric="l2",
                                    use_pallas=True))
best_of(f_match, da, da, va, va, name="match_pallas_128p")
ti, ok = f_match(da, da, va, va)
fence((ti, ok))

# 4. vote only
@jax.jit
def vote_only(ra, ca_, ti, ok):
    d_row, d_col, v = jax.vmap(vote.displacement_from_matches)(
        ra, ca_, ra, ca_, ti, ok)
    dr, dc, nv, _ = vote.mode_vote_batch(d_row, d_col, v)
    drf, dcf = jax.vmap(vote.displacement_from_matches_f)(ra, ca_, ra, ca_, ti)
    return vote.subpixel_refine_batch(d_row, d_col, drf, dcf, v, dr, dc)

best_of(vote_only, ra, ca_, ti, ok, name="vote_mode_128p")
print("done", flush=True)
