"""Pool sub-stage decomposition: DoH-select kernels vs atlas+describe.

Times lax.map sweeps over all 89 frames for (a) the DoH select chain only
and (b) the full fused program; the difference is the atlas build +
describe kernel share.  Appends to baselines/pool_profile_r5_tpu.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "baselines", "pool_profile_r5_tpu.json")


def main():
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    from imagestitch_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from imagestitch_tpu import StitchConfig
    from imagestitch_tpu.core import feature_registration as freg
    from imagestitch_tpu.io import dataset
    from imagestitch_tpu.ops.features import detect
    from imagestitch_tpu.ops.pallas import doh

    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)).sum())())
    files = dataset.list_project_images(
        "/root/reference/demoImages/dendriticCrystal", 1)
    n = len(files)
    batch = dataset.load_batch(files, color_mode=False)
    gray = jnp.concatenate([jax.device_put(batch.gray[s:s + 8])
                            for s in range(0, n, 8)])

    def fence(x):
        for l in jax.tree_util.tree_leaves(x):
            if hasattr(l, "block_until_ready"):
                np.asarray(jnp.sum(l.reshape(-1)[:1].astype(jnp.float32)))
        return x

    cfg = StitchConfig(registration="feature_incre", direction=1,
                       direct_incre=1, roi_ratio=0.2)
    cfg_pool = cfg.replace(features=dataclasses.replace(
        cfg.features, upright=True))
    params = freg._detect_params(cfg_pool)
    spacing = 2.0 ** (1.0 / max(params.n_octave_layers, 1))

    def doh_only(img):
        x = img.astype(jnp.float32)
        outs = []
        xo = x
        for o in range(params.n_octaves):
            if o > 0:
                if min(xo.shape) < 256:
                    break
                xo = detect._pool2(xo)
            bo = max(1, -(-params.border // (1 << o)))
            r_c = freg._ROW_CANDS[min(o, len(freg._ROW_CANDS) - 1)]
            outs.extend(doh.doh_select(
                xo, r_cands=r_c, threshold=params.threshold,
                n_scales=params.n_octave_layers,
                base_sigma=params.base_sigma,
                border=bo, spacing=spacing))
        return tuple(outs)

    @jax.jit
    def doh_sweep(imgs):
        return jax.lax.map(doh_only, imgs)

    def pool2_only(img):
        x = img.astype(jnp.float32)
        outs = []
        xo = x
        for o in range(params.n_octaves):
            if o > 0:
                if min(xo.shape) < 256:
                    break
                xo = detect._pool2(xo)
            outs.append(jnp.sum(xo[:1, :1]))
        return tuple(outs)

    @jax.jit
    def pool2_sweep(imgs):
        return jax.lax.map(pool2_only, imgs)

    res = {}
    fence(doh_sweep(gray))
    t = min(_t(lambda: fence(doh_sweep(gray))) for _ in range(3))
    res["stage_doh_select_s"] = round(t, 3)
    fence(pool2_sweep(gray))
    t2 = min(_t(lambda: fence(pool2_sweep(gray))) for _ in range(3))
    res["stage_pyramid_downsample_s"] = round(t2, 3)
    fence(freg._precompute_pool(gray, cfg_pool))
    tf = min(_t(lambda: fence(freg._precompute_pool(gray, cfg_pool)))
             for _ in range(3))
    res["stage_full_pool_s"] = round(tf, 3)
    print(json.dumps(res), flush=True)

    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data.update(res)
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)


def _t(f):
    t0 = time.time()
    f()
    return time.time() - t0


if __name__ == "__main__":
    main()


def readback_threads_probe():
    """4/6/8-thread stream readback rates (appended to the same JSON)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from imagestitch_tpu import StitchConfig
    from imagestitch_tpu.core import feature_registration as freg
    from imagestitch_tpu.core import stream_out, compose as compose_mod
    from imagestitch_tpu.io import dataset
    from imagestitch_tpu.utils.transfer import read_back
    files = dataset.list_project_images(
        "/root/reference/demoImages/dendriticCrystal", 1)
    n = len(files)
    batch = dataset.load_batch(files, color_mode=False)
    gray = jnp.concatenate([jax.device_put(batch.gray[s:s + 8])
                            for s in range(0, n, 8)])
    cfg = StitchConfig(registration="feature_incre", direction=1,
                       direct_incre=1, roi_ratio=0.2)
    recs = freg.register_sequence_features_incre(gray, cfg)
    segs, start = [], 0
    for k, r in enumerate(recs):
        if not r.ok:
            segs.append((start, k + 1)); start = k + 1
    segs.append((start, n))
    s, e = max(((s, e) for s, e in segs if e - s >= 2),
               key=lambda se: se[1] - se[0])
    offs = [recs[k].offset for k in range(s, e - 1)]
    h, w = batch.gray.shape[1:3]
    placement, steps, _ = compose_mod.plan_compose(offs, (h, w), cfg)
    pano = compose_mod.compose(gray[s:e], offs, cfg, return_device=True)
    rects = stream_out.visible_rect_pieces(steps, (h, w))
    flat = stream_out._extract_rects_flat(pano, rects)
    np.asarray(flat[:1])
    mb = flat.nbytes / 1e6
    out = {}
    for nt in (3, 4, 6, 8):
        t = min(_t(lambda: read_back(flat, threads=nt)) for _ in range(2))
        out[f"stream_read_{nt}t_MBps"] = round(mb / t, 1)
        print(nt, out[f"stream_read_{nt}t_MBps"], flush=True)
    import json as j
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = j.load(f)
    data.update(out)
    with open(OUT, "w") as f:
        j.dump(data, f, indent=1)


if __name__ == "__main__":
    readback_threads_probe()
