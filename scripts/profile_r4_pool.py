"""Round-4 pool measurement: fused-select v2 vs round-3 v1 on the real TPU.

One process: times both pool paths over the 89 dendritic frames, then runs
the full incremental registration on the v2 pool and checks the golden
chain (VERDICT r3 item 1 acceptance: register_pool_s <= 1.2 s, accuracy
unchanged)."""
import dataclasses, json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from imagestitch_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from imagestitch_tpu import StitchConfig
from imagestitch_tpu.core import feature_registration as freg
from imagestitch_tpu.eval import accuracy
from imagestitch_tpu.io import dataset

files = dataset.list_project_images(
    "/root/reference/demoImages/dendriticCrystal", 1)
batch = dataset.load_batch(files, color_mode=False)
gray = jnp.concatenate([jax.device_put(batch.gray[s:s + 8])
                        for s in range(0, len(files), 8)])
np.asarray(gray[:1, :1, :1].astype(jnp.float32).sum())
print("loaded", gray.shape, "backend", jax.default_backend(), flush=True)

cfg = StitchConfig(registration="feature_incre", direction=1, direct_incre=1,
                   roi_ratio=0.2, color_mode=False)
cfg_up = cfg.replace(features=dataclasses.replace(cfg.features, upright=True))
params = freg._detect_params(cfg_up)
sparams = freg._describe_params(cfg_up)
max_pool = freg._capacity(cfg_up, cfg_up.features.pool_keypoints)


def fence(x):
    for l in jax.tree_util.tree_leaves(x):
        np.asarray(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32)))


def best_of(f, *args, n=3, name=""):
    best = 1e9
    out = None
    for _ in range(n):
        t0 = time.time()
        out = f(*args)
        fence(out)
        best = min(best, time.time() - t0)
    print(f"{name}: {best:.3f} s total  ({best*1000/len(files):.2f} ms/frame)",
          flush=True)
    return out, best


pool_v2, t_v2 = best_of(
    lambda im: freg._pool_features_jit(im, max_pool, params, sparams,
                                       use_pallas_doh=True,
                                       fused_select=True),
    gray, name="pool_v2_fused")
print("v2 pool shapes:", [tuple(p.shape) for p in pool_v2], flush=True)

pool_v1, t_v1 = best_of(
    lambda im: freg._pool_features_jit(im, max_pool, params, sparams,
                                       use_pallas_doh=True,
                                       fused_select=False),
    gray, name="pool_v1_topk")

# --- full registration on the v2 pool + golden-chain check ---------------
n, h, w = batch.gray.shape
t0 = time.time()
recs = freg.replay_from_pool(pool_v2, n, (h, w), cfg_up)
t_replay = time.time() - t0
print(f"replay on v2 pool: {t_replay:.3f} s, "
      f"stats={freg.LAST_REPLAY_STATS}", flush=True)

golden = accuracy.dendritic_golden_89()
ok = sum(r.ok for r in recs)
errs = []
for r, g in zip(recs, golden):
    if not r.ok or abs(g[0]) >= h:
        continue
    errs.append(max(abs(r.offset[0] - g[0]), abs(r.offset[1] - g[1])))
res = {"pool_v2_s": round(t_v2, 3), "pool_v1_s": round(t_v1, 3),
       "replay_v2_s": round(t_replay, 3),
       "ok_pairs": ok, "n_pairs": len(recs),
       "compared": len(errs),
       "mean_err_chebyshev_px": round(float(np.mean(errs)), 4),
       "max_err_chebyshev_px": int(np.max(errs)),
       "within_1px": int(sum(e <= 1 for e in errs))}
print(json.dumps(res), flush=True)

# per-pair offsets for diffing against the v1 accuracy table
offs = [list(r.offset) if r.ok else None for r in recs]
print("offsets:", json.dumps(offs), flush=True)
