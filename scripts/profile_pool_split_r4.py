"""v2 pool stage split: doh_select kernels vs describe kernel vs glue.

Decides whether an MXU-matmul rewrite of the DoH convolutions is the next
lever (only worth it if the conv stage dominates the 1.03 s pool)."""
import dataclasses, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from imagestitch_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from imagestitch_tpu import StitchConfig
from imagestitch_tpu.core import feature_registration as freg
from imagestitch_tpu.io import dataset
from imagestitch_tpu.ops.features import detect
from imagestitch_tpu.ops.pallas import doh

files = dataset.list_project_images(
    "/root/reference/demoImages/dendriticCrystal", 1)
batch = dataset.load_batch(files, color_mode=False)
gray = jnp.concatenate([jax.device_put(batch.gray[s:s + 8])
                        for s in range(0, len(files), 8)])
np.asarray(gray[:1, :1, :1].astype(jnp.float32).sum())
cfg = StitchConfig(registration="feature_incre", direction=1, direct_incre=1,
                   roi_ratio=0.2, color_mode=False)
cfg = cfg.replace(features=dataclasses.replace(cfg.features, upright=True))
params = freg._detect_params(cfg)
sparams = freg._describe_params(cfg)
spacing = 2.0 ** (1.0 / max(params.n_octave_layers, 1))


def fence(x):
    for l in jax.tree_util.tree_leaves(x):
        np.asarray(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32)))


def best_of(f, *args, n=3, name=""):
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        fence(f(*args))
        best = min(best, time.time() - t0)
    print(f"{name}: {best:.3f} s ({best*1000/89:.2f} ms/frame)", flush=True)


def select_only(img):
    x = img.astype(jnp.float32)
    acc = []
    xo = x
    for o in range(params.n_octaves):
        if o > 0:
            if min(xo.shape) < 256:
                break
            xo = detect._pool2(xo)
        bo = max(1, -(-params.border // (1 << o)))
        r_c = freg._ROW_CANDS[min(o, len(freg._ROW_CANDS) - 1)]
        sc, col, drs, dcs = doh.doh_select(
            xo, r_cands=r_c, threshold=params.threshold,
            n_scales=params.n_octave_layers, base_sigma=params.base_sigma,
            border=bo, spacing=spacing)
        acc.append(sc.sum() + col.sum() + drs.sum() + dcs.sum())
    return jnp.stack(acc)


best_of(jax.jit(lambda im: jax.lax.map(select_only, im)), gray,
        name="doh_select_all_octaves")

best_of(jax.jit(lambda im: jax.lax.map(
    lambda i: freg._detect_describe_image_pallas_v2(i, params, sparams),
    im)), gray, name="full_v2_pool")
print("done", flush=True)
