"""Round-5 evidence: streamed output vs full readback + H2D concurrency.

One TPU process (tunnel init paid once).  Writes
baselines/stream_profile_tpu.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "baselines", "stream_profile_tpu.json")


def main():
    import jax
    import jax.numpy as jnp
    from imagestitch_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from imagestitch_tpu import StitchConfig, compose
    from imagestitch_tpu.core import feature_registration as freg
    from imagestitch_tpu.core import stream_out
    from imagestitch_tpu.core import compose as compose_mod
    from imagestitch_tpu.io import dataset
    from imagestitch_tpu.utils.transfer import read_back

    res = {}
    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((8, 128)).sum())())
    res["backend_init_s"] = round(time.time() - t0, 1)
    print("backend up", res["backend_init_s"], flush=True)

    files = dataset.list_project_images(
        "/root/reference/demoImages/dendriticCrystal", 1)
    n = len(files)
    cfg = StitchConfig(registration="feature_incre", direction=1,
                       direct_incre=1, roi_ratio=0.2, color_mode=False,
                       fuse_method="fadeInAndFadeOut")
    t0 = time.time()
    batch = dataset.load_batch(files, color_mode=False)
    res["decode_s"] = round(time.time() - t0, 2)
    gray_host = batch.gray
    h, w = gray_host.shape[1:3]
    print("decoded", res["decode_s"], flush=True)

    def fence(x):
        for l in jax.tree_util.tree_leaves(x):
            if hasattr(l, "block_until_ready"):
                np.asarray(jnp.sum(l.reshape(-1)[:1].astype(jnp.float32)))
        return x

    # ---- H2D shapes: serial chunked vs threaded-concurrent chunked ----
    from concurrent.futures import ThreadPoolExecutor
    bytes_total = gray_host.nbytes

    def h2d_serial(chunk):
        t0 = time.time()
        parts = [jax.device_put(gray_host[s:s + chunk])
                 for s in range(0, n, chunk)]
        fence(parts)
        dt = time.time() - t0
        del parts
        return dt

    def h2d_threads(chunk, nthreads):
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=nthreads) as ex:
            parts = list(ex.map(
                lambda s: jax.device_put(gray_host[s:s + chunk]),
                range(0, n, chunk)))
        fence(parts)
        dt = time.time() - t0
        del parts
        return dt

    res["h2d"] = {}
    for name, fn in [("serial_c8", lambda: h2d_serial(8)),
                     ("threads2_c8", lambda: h2d_threads(8, 2)),
                     ("threads4_c8", lambda: h2d_threads(8, 4)),
                     ("threads4_c4", lambda: h2d_threads(4, 4)),
                     ("threads8_c4", lambda: h2d_threads(4, 8))]:
        dt = min(fn() for _ in range(2))
        res["h2d"][name] = {"s": round(dt, 2),
                            "MBps": round(bytes_total / dt / 1e6, 1)}
        print("h2d", name, res["h2d"][name], flush=True)

    # device-resident batch for the rest
    gray = jnp.concatenate([jax.device_put(gray_host[s:s + 8])
                            for s in range(0, n, 8)])
    fence(gray)

    # ---- register (warm x2) ----
    t_reg = float("inf")
    for _ in range(2):
        t0 = time.time()
        recs = freg.register_sequence_features_incre(gray, cfg)
        t_reg = min(t_reg, time.time() - t0)
    res["register_s"] = round(t_reg, 2)
    print("register", t_reg, flush=True)

    def segments(recs, n):
        segs, start = [], 0
        for k, r in enumerate(recs):
            if not r.ok:
                segs.append((start, k + 1))
                start = k + 1
        segs.append((start, n))
        return segs

    segs = [(s, e) for s, e in segments(recs, n) if e - s >= 2]

    # ---- compose + FULL readback (round-4 path) ----
    def full_path():
        t0 = time.time()
        outs = []
        for s, e in segs:
            offs = [recs[k].offset for k in range(s, e - 1)]
            outs.append(compose(gray[s:e], offs, cfg, return_device=True))
        fence(outs)
        t_c = time.time() - t0
        t0 = time.time()
        host = [read_back(o) for o in outs]
        t_rb = time.time() - t0
        return t_c, t_rb, host

    t_c, t_rb, host_full = full_path()
    t_c2, t_rb2, _ = full_path()
    res["compose_s"] = round(min(t_c, t_c2), 2)
    res["full_readback_s"] = round(min(t_rb, t_rb2), 2)
    pano_bytes = sum(x.nbytes for x in host_full)
    res["pano_MB"] = round(pano_bytes / 1e6, 1)
    print("full", res["compose_s"], res["full_readback_s"], flush=True)

    # ---- streamed path ----
    def stream_path():
        t0 = time.time()
        outs = []
        for s, e in segs:
            offs = [recs[k].offset for k in range(s, e - 1)]
            outs.append(stream_out.compose_streamed(
                gray_host[s:e], offs, cfg, frames_dev=gray[s:e]))
        return time.time() - t0, outs
    t_s, host_stream = stream_path()
    t_s2, _ = stream_path()
    res["streamed_total_s"] = round(min(t_s, t_s2), 2)
    rect_bytes = 0
    for s, e in segs:
        offs = [recs[k].offset for k in range(s, e - 1)]
        _, steps, _ = compose_mod.plan_compose(offs, (h, w), cfg)
        rect_bytes += sum(rh * rw for _, _, rh, rw in
                          stream_out.fuse_rects_of_steps(steps))
    res["rect_MB"] = round(rect_bytes / 1e6, 1)
    eq = all(np.array_equal(a, b) for a, b in zip(host_full, host_stream))
    res["streamed_equals_full"] = bool(eq)
    print("stream", res["streamed_total_s"], "eq", eq, flush=True)
    del host_full, host_stream

    # ---- color: host path vs device compose, equality on a subset ----
    sub = min(12, n)
    batch_c = dataset.load_batch(files[:sub], color_mode=True)
    sub_segs = [(s, min(e, sub)) for s, e in segs if s < sub and
                min(e, sub) - s >= 2]
    cfg_c = cfg.replace(color_mode=True)
    t0 = time.time()
    col_host = []
    for s, e in sub_segs:
        offs = [recs[k].offset for k in range(s, e - 1)]
        col_host.append(stream_out.compose_color_host(
            batch_c.color[s:e], offs, cfg_c))
    res["color_host_subset_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    col_host2 = []
    for s, e in sub_segs:
        offs = [recs[k].offset for k in range(s, e - 1)]
        col_host2.append(stream_out.compose_color_host(
            batch_c.color[s:e], offs, cfg_c))
    res["color_host_subset_warm_s"] = round(time.time() - t0, 2)
    # device color compose on the subset (upload timed separately)
    t0 = time.time()
    color_dev = jnp.concatenate([jax.device_put(batch_c.color[s:s + 4])
                                 for s in range(0, sub, 4)])
    fence(color_dev)
    res["color_h2d_subset_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    col_dev = []
    for s, e in sub_segs:
        offs = [recs[k].offset for k in range(s, e - 1)]
        col_dev.append(compose(color_dev[s:e], offs, cfg_c,
                               return_device=True))
    fence(col_dev)
    res["color_device_compose_subset_s"] = round(time.time() - t0, 2)
    col_dev_host = [read_back(o) for o in col_dev]
    eqc = all(np.array_equal(a, b) for a, b in zip(col_host2, col_dev_host))
    res["color_host_equals_device"] = bool(eqc)
    if not eqc:
        for a, b in zip(col_host2, col_dev_host):
            if not np.array_equal(a, b):
                d = (a.astype(np.int32) - b.astype(np.int32))
                res["color_max_abs_diff"] = int(np.abs(d).max())
                res["color_diff_frac"] = float((d != 0).mean())
                break
    print("color eq", eqc, flush=True)

    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
