"""One-shot round-4 evidence run (single process, one backend init):

  1. warm pool-v2/replay/fallback decomposition -> baselines/pool_profile_tpu.json
  2. box_filter-mode flagship register seconds  -> baselines/box_filter_bench_tpu.json
  3. 1024-tile stretch on the REAL chip (D=1)   -> baselines/stretch_1000_tpu.json
  4. detector-mode accuracy + NCC-argmax sweep  -> baselines/accuracy_modes_tpu.json
  5. dendritic drift chain-vs-solved refresh    -> baselines/drift_dendritic.json
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imagestitch_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

BASE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "baselines")


def _fence(x):
    import jax
    import jax.numpy as jnp
    import numpy as np
    for l in jax.tree_util.tree_leaves(x):
        if hasattr(l, "block_until_ready"):
            np.asarray(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32)))


# ---- 1. warm pool/replay decomposition -----------------------------------
def pool_profile():
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagestitch_tpu import StitchConfig
    from imagestitch_tpu.core import feature_registration as freg
    from imagestitch_tpu.io import dataset

    files = dataset.list_project_images(
        "/root/reference/demoImages/dendriticCrystal", 1)
    batch = dataset.load_batch(files, color_mode=False)
    gray = jnp.concatenate([jax.device_put(batch.gray[s:s + 8])
                            for s in range(0, len(files), 8)])
    _fence(gray)
    n, h, w = batch.gray.shape
    cfg = StitchConfig(registration="feature_incre", direction=1,
                       direct_incre=1, roi_ratio=0.2, color_mode=False)
    cfg_up = cfg.replace(features=dc.replace(cfg.features, upright=True))

    out = {"what": "Warm device-time decomposition of the round-4 fused "
                   "pool (per-row Pallas select + band-streamed describe), "
                   "89 dendritic frames, min of 3 fenced runs (v5e tunnel)",
           "harness": "scripts/evidence_r4.py"}
    t_pool = t_replay = t_fb = float("inf")
    for _ in range(3):
        t0 = time.time()
        pool = freg._precompute_pool(gray, cfg_up)
        _fence(pool)
        t_pool = min(t_pool, time.time() - t0)
        t0 = time.time()
        recs = freg.replay_from_pool(pool, n, (h, w), cfg_up)
        t_replay = min(t_replay, time.time() - t0)
        t0 = time.time()
        recs2 = freg._oriented_fallback_incre(gray, recs, cfg, (h, w))
        t_fb = min(t_fb, time.time() - t0)
    out["pool_v2_s"] = round(t_pool, 3)
    out["replay_s"] = round(t_replay, 3)
    out["fallback_s"] = round(t_fb, 3)
    out["replay_stats"] = dict(freg.LAST_REPLAY_STATS)
    out["pool_capacity"] = int(pool[0].shape[1])
    out["ok_pairs"] = int(sum(r.ok for r in recs2))
    out["failed_pair_confidences"] = [
        round(r.confidence, 2) for r in recs2 if not r.ok]
    # legacy v1 pool for the comparison row
    t_v1 = float("inf")
    for _ in range(2):
        t0 = time.time()
        p1 = freg._pool_features_jit(
            gray, freg._capacity(cfg_up, cfg_up.features.pool_keypoints),
            freg._detect_params(cfg_up), freg._describe_params(cfg_up),
            use_pallas_doh=True, fused_select=False)
        _fence(p1)
        t_v1 = min(t_v1, time.time() - t0)
    del p1
    out["pool_v1_topk_s"] = round(t_v1, 3)
    out["note"] = ("v2 selection+subpixel run inside the DoH kernel "
                   "(zero HBM score maps, zero gathers, zero top-k); "
                   "describe streams the atlas through VMEM")
    with open(os.path.join(BASE, "pool_profile_tpu.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("pool_profile:", json.dumps(out), flush=True)
    return gray, batch, cfg, cfg_up


def box_filter_bench(gray, batch, cfg):
    """VERDICT r3 item 8: the bit-match-chasing box_filter mode's measured
    cost on the flagship bench (it routes through the XLA detector)."""
    import dataclasses as dc

    from imagestitch_tpu.core import feature_registration as freg

    n, h, w = batch.gray.shape
    cfg_box = cfg.replace(features=dc.replace(
        cfg.features, box_filter=True, auto_upright=False,
        octave_topk_decay=1))
    t_reg = float("inf")
    for _ in range(2):
        t0 = time.time()
        recs = freg.register_sequence_features_incre(gray, cfg_box)
        t_reg = min(t_reg, time.time() - t0)
    out = {"what": "box_filter=True (reference's integral-image SURF "
                   "detector, oriented descriptors, flat budgets) flagship "
                   "register seconds, 89 dendritic frames, warm min-of-2",
           "register_s": round(t_reg, 3),
           "frames_per_s": round(n / t_reg, 2),
           "ok_pairs": int(sum(r.ok for r in recs)),
           "note": "the parity mode runs the XLA box-response detector "
                   "(Pallas DoH covers the Gaussian-derivative family); "
                   "this publishes its real cost next to the default mode"}
    with open(os.path.join(BASE, "box_filter_bench_tpu.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("box_filter:", json.dumps(out), flush=True)


def stretch_tpu():
    from imagestitch_tpu.eval import stretch

    runs = []
    for _ in range(2):       # first pass pays compiles; second is warm
        t0 = time.time()
        rep = stretch.run(grid=32, n_devices=1)
        runs.append((time.time() - t0, rep))
    total, rep = runs[-1]
    d = dataclasses.asdict(rep)
    d["total_s"] = round(total, 2)
    d["tiles_per_s"] = round(rep.n_tiles / total, 2)
    d["cold_total_s"] = round(runs[0][0], 2)
    d["what"] = ("1024-tile stretch on the REAL single TPU chip, warm pass "
                 "(VERDICT r3 item 6; register -> spatial-hash propose -> "
                 "bucketed windowed verify -> CG solve -> compose)")
    with open(os.path.join(BASE, "stretch_1000_tpu.json"), "w") as f:
        json.dump(d, f, indent=2)
    print("stretch_tpu:", json.dumps(d), flush=True)


def pipelined_profile():
    """Decompose the decode-included pipelined ingest (bench's
    fps_decode_included swung 6.0 -> 2.3; is it the framework or the
    tunnel?)."""
    from imagestitch_tpu import StitchConfig, compose
    from imagestitch_tpu.core import feature_registration as freg
    from imagestitch_tpu.io import dataset, prefetch

    files = dataset.list_project_images(
        "/root/reference/demoImages/dendriticCrystal", 1)
    cfg = StitchConfig(registration="feature_incre", direction=1,
                       direct_incre=1, roi_ratio=0.2, color_mode=False)
    import dataclasses as dc
    cfg_pool = cfg.replace(features=dc.replace(cfg.features, upright=True))
    out = {"runs": []}
    for _ in range(3):
        t0 = time.time()
        pool, gray_dev, _ = prefetch.pooled_features_pipelined(files, cfg_pool)
        _fence(pool)
        t_pool = time.time() - t0
        n, h, w = gray_dev.shape
        t0 = time.time()
        recs = freg.replay_from_pool(pool, n, (h, w), cfg_pool)
        t_replay = time.time() - t0
        out["runs"].append({"pipelined_pool_s": round(t_pool, 2),
                            "replay_s": round(t_replay, 2)})
        del pool, gray_dev
        print("pipelined run:", out["runs"][-1], flush=True)
    with open(os.path.join(BASE, "pipelined_profile_tpu.json"), "w") as f:
        json.dump(out, f, indent=2)


def scaling_t1():
    """Single-chip TPU step times for the scaling harness's workloads —
    the t1 feeding predicted_efficiency_v5e in the CPU-mesh scaling JSONs
    (the virtual mesh validates structure; this anchors the prediction to
    real silicon)."""
    import jax
    import numpy as np

    from imagestitch_tpu.parallel import pipeline

    rng = np.random.default_rng(0)
    out = {"what": "1-device TPU step seconds for the scaling workloads",
           "harness": "scripts/evidence_r4.py"}
    # phase workload (matches scaling_phase_cpu_mesh.json: 33 x 512 x 768)
    base = rng.integers(0, 255, (80 * 33 + 512, 768), np.uint8)
    images = np.stack([base[80 * i:80 * i + 512] for i in range(33)])
    a, b, _ = pipeline.make_pair_tensors(images, None)
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        r = pipeline.register_pairs_sharded(a, b, 1, 0.25)
        _fence(r)
        best = min(best, time.time() - t0)
    out["phase_t1_s"] = round(best, 4)
    # feature workload (matches scaling_feature_cpu_mesh.json: 17 x 256 x 384)
    base = rng.integers(0, 255, (48 * 17 + 256, 384), np.uint8)
    images = np.stack([base[48 * i:48 * i + 256] for i in range(17)])
    from imagestitch_tpu.config import FeatureConfig, StitchConfig
    cfg = StitchConfig(features=FeatureConfig(pool_keypoints=512,
                                              max_keypoints=256))
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        r = pipeline.register_pairs_sharded_features(images, None, cfg=cfg,
                                                     direction=1, ratio=0.25)
        best = min(best, time.time() - t0)
    out["feature_t1_s"] = round(best, 4)
    # compose-bench workload (serpentine 24-tile synthetic), single device
    from imagestitch_tpu.config import StitchConfig as _SC
    from imagestitch_tpu.core.compose import compose as _compose
    from imagestitch_tpu.eval.compose_bench import _serpentine
    tiles, offs = _serpentine(np.random.default_rng(0))
    ccfg = _SC(color_mode=False, fuse_method="fadeInAndFadeOut",
               registration="phase_incre")
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        o = _compose(tiles, offs, ccfg, return_device=True)
        _fence(o)
        best = min(best, time.time() - t0)
    out["compose_t1_s"] = round(best, 4)
    with open(os.path.join(BASE, "scaling_t1_tpu.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("scaling_t1:", json.dumps(out), flush=True)


def accuracy_sweep():
    from imagestitch_tpu.eval import accuracy

    t0 = time.time()
    res = accuracy.run_modes()
    payload = {m: {k: dataclasses.asdict(v) for k, v in r.items()}
               for m, r in res.items()}
    with open(os.path.join(BASE, "accuracy_modes_tpu.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print(f"modes done in {time.time()-t0:.0f}s", flush=True)
    for m, r in res.items():
        for k, v in r.items():
            print(m, k, "ok", v.num_ok, "mean", v.mean_abs_err_px,
                  "within1", v.within_1px, "of", v.compared_pairs,
                  "disputed", v.disputed_pairs,
                  "ours_argmax", v.disputed_ours_argmax,
                  "golden_argmax", v.disputed_golden_argmax, flush=True)


def drift_refresh():
    from imagestitch_tpu.eval import loop_closure_demo

    t0 = time.time()
    rep = loop_closure_demo.run()
    with open(os.path.join(BASE, "drift_dendritic.json"), "w") as f:
        json.dump(dataclasses.asdict(rep), f, indent=2)
    print(f"drift done in {time.time()-t0:.0f}s:",
          json.dumps(dataclasses.asdict(rep)), flush=True)


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"pool", "box", "stretch", "accuracy",
                                  "drift"}
    gray = batch = cfg = cfg_up = None
    if "pool" in which or "box" in which:
        gray, batch, cfg, cfg_up = pool_profile()
    if "box" in which:
        box_filter_bench(gray, batch, cfg)
    if gray is not None:
        del gray, batch
    if "stretch" in which:
        stretch_tpu()
    if "pipelined" in which or not sys.argv[1:]:
        pipelined_profile()
    if "t1" in which or not sys.argv[1:]:
        scaling_t1()
    if "accuracy" in which:
        accuracy_sweep()
    if "drift" in which:
        drift_refresh()
    print("ALL DONE", flush=True)
