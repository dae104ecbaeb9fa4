"""Decompose the upright pool's 32 ms/frame: DoH maps vs select vs describe."""
import dataclasses, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from imagestitch_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from imagestitch_tpu import StitchConfig
from imagestitch_tpu.core import feature_registration as freg
from imagestitch_tpu.ops.features import detect, describe
from imagestitch_tpu.ops.pallas import doh
from imagestitch_tpu.io import dataset

files = dataset.list_project_images("/root/reference/demoImages/dendriticCrystal", 1)
batch = dataset.load_batch(files, color_mode=False)
gray = jnp.concatenate([jax.device_put(batch.gray[s:s+8]) for s in range(0, 89, 8)])
np.asarray(gray[:1, :1, :1].astype(jnp.float32).sum())
print("loaded", gray.shape, flush=True)

cfg = StitchConfig(registration="feature_incre", direction=1, direct_incre=1,
                   roi_ratio=0.2, color_mode=False)
cfg = cfg.replace(features=dataclasses.replace(cfg.features, upright=True))
params = freg._detect_params(cfg)
sparams = freg._describe_params(cfg)
max_kp = freg._capacity(cfg, cfg.features.pool_keypoints)
spacing = 2.0 ** (1.0 / max(params.n_octave_layers, 1))


def octaves(x):
    out = []
    xo = x
    for o in range(params.n_octaves):
        if o > 0:
            if min(xo.shape) < 256:
                break
            xo = detect._pool2(xo)
        out.append((o, xo))
    return out


def stage_maps(img):
    x = img.astype(jnp.float32)
    acc = []
    for o, xo in octaves(x):
        bo = max(1, -(-params.border // (1 << o)))
        score, raw = doh.doh_score_map(xo, threshold=params.threshold,
                                       n_scales=params.n_octave_layers,
                                       base_sigma=params.base_sigma,
                                       border=bo, spacing=spacing)
        acc.append(score.sum() + raw.sum())
    return jnp.stack(acc)


def stage_select(img):
    x = img.astype(jnp.float32)
    acc = []
    for o, xo in octaves(x):
        ho, wo = xo.shape
        bo = max(1, -(-params.border // (1 << o)))
        score, raw = doh.doh_score_map(xo, threshold=params.threshold,
                                       n_scales=params.n_octave_layers,
                                       base_sigma=params.base_sigma,
                                       border=bo, spacing=spacing)
        bud = detect.octave_budget(max_kp, o, params.octave_topk_decay)
        kk = min(bud, ho * wo)
        fs, fi = jax.lax.approx_max_k(score.reshape(-1), kk, recall_target=0.95)
        r = (fi // wo).astype(jnp.int32)
        c = (fi % wo).astype(jnp.int32)
        dr, dc = detect.refine_subpixel(raw, r, c)
        acc.append(fs.sum() + dr.sum() + dc.sum() + r.sum() + c.sum())
    return jnp.stack(acc)


def stage_full(img):
    return freg._detect_describe_image_pallas(img, max_kp, params, sparams)


def fence(x):
    for l in jax.tree_util.tree_leaves(x):
        np.asarray(jnp.sum(l[..., :1].astype(jnp.float32)))


for name, fn in (("maps", stage_maps), ("select", stage_select),
                 ("full", stage_full)):
    f = jax.jit(lambda im, fn=fn: jax.lax.map(fn, im))
    best = 1e9
    for i in range(3):
        t0 = time.time()
        fence(f(gray))
        dt = time.time() - t0
        best = min(best, dt)
        print(f"{name} run{i}: {dt:.2f} s", flush=True)
    print(f"{name}: {best:.2f} s", flush=True)
