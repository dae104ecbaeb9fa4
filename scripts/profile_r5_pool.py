"""Round-5 pool roofline + replay/fallback profile (VERDICT r4 item 3).

One TPU process.  Writes baselines/pool_profile_r5_tpu.json.
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

    import jax
    import jax.numpy as jnp
    from imagestitch_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from imagestitch_tpu import StitchConfig
    from imagestitch_tpu.core import feature_registration as freg
    from imagestitch_tpu.core import stream_out, compose as compose_mod
    from imagestitch_tpu.io import dataset
    from imagestitch_tpu.utils.transfer import read_back

    res = {}
    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)).sum())())
    res["backend_init_s"] = round(time.time() - t0, 1)
    print("up", res["backend_init_s"], flush=True)

    files = dataset.list_project_images(
        "/root/reference/demoImages/dendriticCrystal", 1)
    n = len(files)
    batch = dataset.load_batch(files, color_mode=False)
    gray_host = batch.gray
    h, w = gray_host.shape[1:3]
    gray = jnp.concatenate([jax.device_put(gray_host[s:s + 8])
                            for s in range(0, n, 8)])

    def fence(x):
        for l in jax.tree_util.tree_leaves(x):
            if hasattr(l, "block_until_ready"):
                np.asarray(jnp.sum(l.reshape(-1)[:1].astype(jnp.float32)))
        return x

    cfg = StitchConfig(registration="feature_incre", direction=1,
                       direct_incre=1, roi_ratio=0.2, color_mode=False,
                       fuse_method="fadeInAndFadeOut")
    cfg_pool = cfg.replace(features=dataclasses.replace(
        cfg.features, upright=True))

    # ---- pool timing: full batch, small batch, single frame ----
    fence(freg._precompute_pool(gray, cfg_pool))        # compile
    t = min(_t(lambda: fence(freg._precompute_pool(gray, cfg_pool)))
            for _ in range(3))
    res["pool_89_s"] = round(t, 3)
    g8 = gray[:8]
    fence(freg._precompute_pool(g8, cfg_pool))
    t8 = min(_t(lambda: fence(freg._precompute_pool(g8, cfg_pool)))
             for _ in range(3))
    res["pool_8_s"] = round(t8, 3)
    res["pool_per_frame_ms_89"] = round(t / n * 1e3, 1)
    res["pool_per_frame_ms_8"] = round(t8 / 8 * 1e3, 1)
    print("pool", res["pool_89_s"], res["pool_8_s"], flush=True)

    # single-frame dispatch (same program the lax.map body runs)
    img = gray[0]
    dp = freg._detect_params(cfg_pool)
    sp = freg._describe_params(cfg_pool)
    one = jax.jit(lambda im: freg._detect_describe_image_pallas_v2(
        im, dp, sp))
    fence(one(img))
    t1 = min(_t(lambda: fence(one(img))) for _ in range(5))
    res["single_frame_ms"] = round(t1 * 1e3, 1)
    print("single frame", res["single_frame_ms"], flush=True)

    # ---- bf16 conv inputs ----
    cfg_bf = cfg_pool.replace(compute_dtype="bfloat16")
    try:
        fence(freg._precompute_pool(gray, cfg_bf))
        tb = min(_t(lambda: fence(freg._precompute_pool(gray, cfg_bf)))
                 for _ in range(3))
        res["pool_89_bf16_s"] = round(tb, 3)
    except Exception as e:
        res["pool_89_bf16_s"] = f"failed: {type(e).__name__}"
    print("bf16", res.get("pool_89_bf16_s"), flush=True)

    # ---- replay + fallback with packed readback ----
    pool = fence(freg._precompute_pool(gray, cfg_pool))
    t_rep = float("inf")
    for _ in range(3):
        t0 = time.time()
        recs = freg.replay_from_pool(pool, n, (h, w), cfg_pool)
        t_rep = min(t_rep, time.time() - t0)
    res["replay_s"] = round(t_rep, 3)
    t_fb = float("inf")
    for _ in range(3):
        t0 = time.time()
        recs2 = freg._oriented_fallback_incre(gray, recs, cfg, (h, w))
        t_fb = min(t_fb, time.time() - t0)
    res["fallback_s"] = round(t_fb, 3)
    print("replay", t_rep, "fallback", t_fb, flush=True)

    # ---- streamed stitch total (headline preview) ----
    def segments(recs):
        segs, start = [], 0
        for k, r in enumerate(recs):
            if not r.ok:
                segs.append((start, k + 1))
                start = k + 1
        segs.append((start, n))
        return [(s, e) for s, e in segs if e - s >= 2]

    def stitch():
        t0 = time.time()
        rr = freg.register_sequence_features_incre(gray, cfg)
        for s, e in segments(rr):
            offs = [rr[k].offset for k in range(s, e - 1)]
            stream_out.compose_streamed(gray_host[s:e], offs, cfg,
                                        frames_dev=gray[s:e])
        return time.time() - t0

    stitch()
    ts = min(stitch() for _ in range(2))
    res["streamed_stitch_s"] = round(ts, 2)
    res["streamed_fps"] = round(n / ts, 2)
    print("streamed", ts, flush=True)

    # ---- visible-piece stream readback rate at 2 vs 3 threads ----
    rr = freg.register_sequence_features_incre(gray, cfg)
    s, e = max(segments(rr), key=lambda se: se[1] - se[0])
    offs = [rr[k].offset for k in range(s, e - 1)]
    placement, steps, _ = compose_mod.plan_compose(offs, (h, w), cfg)
    pano = compose_mod.compose(gray[s:e], offs, cfg, return_device=True)
    rects = stream_out.visible_rect_pieces(steps, (h, w))
    flat = stream_out._extract_rects_flat(pano, rects)
    fence(flat)
    mb = flat.nbytes / 1e6
    for nt in (1, 2, 3):
        t = min(_t(lambda: read_back(flat, threads=nt)) for _ in range(2))
        res[f"stream_read_{nt}t_MBps"] = round(mb / t, 1)
    res["stream_MB"] = round(mb, 1)
    print("readback rates", {k: v for k, v in res.items()
                             if "MBps" in k}, flush=True)

    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


def _t(f):
    t0 = time.time()
    f()
    return time.time() - t0


if __name__ == "__main__":
    main()
