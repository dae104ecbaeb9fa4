"""Profiling scratch: decompose the flagship registration hot path on TPU.

Warm-run decomposition with explicit readback fences (the axon tunnel's
block_until_ready can return before device completion; a host readback of a
small result is the reliable fence).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from imagestitch_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from imagestitch_tpu import StitchConfig
from imagestitch_tpu.core import feature_registration as freg
from imagestitch_tpu.io import dataset

DEMO = "/root/reference/demoImages"


def fence(x):
    """Force device completion via a tiny readback."""
    leaves = jax.tree_util.tree_leaves(x)
    for l in leaves:
        if hasattr(l, "addressable_shards") or hasattr(l, "block_until_ready"):
            np.asarray(jnp.sum(l.astype(jnp.float32)))
    return x


def timed(label, fn, *a, repeats=2, **k):
    best = None
    for i in range(repeats):
        t0 = time.time()
        r = fence(fn(*a, **k))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        print(f"  {label} run{i}: {dt:.2f} s", flush=True)
    return best, r


def main():
    files = dataset.list_project_images(os.path.join(DEMO, "dendriticCrystal"), 1)
    batch = dataset.load_batch(files, color_mode=False)
    gray = jax.device_put(batch.gray)
    fence(gray)
    n, h, w = gray.shape
    print(f"frames: {n} x {h} x {w}", flush=True)

    cfg = StitchConfig(registration="feature_incre", direction=1,
                       direct_incre=1, roi_ratio=0.2, color_mode=False)

    variants = [
        ("default(pallas,oriented,f32,6144)", cfg),
        ("upright", cfg.replace(features=dataclasses.replace(
            cfg.features, upright=True))),
        ("bf16", cfg.replace(compute_dtype="bfloat16")),
        ("bf16+upright", cfg.replace(
            compute_dtype="bfloat16",
            features=dataclasses.replace(cfg.features, upright=True))),
        ("pool3072", cfg.replace(features=dataclasses.replace(
            cfg.features, pool_keypoints=3072))),
    ]
    pools = {}
    for name, c in variants:
        dt, pool = timed(f"pool {name}", freg._precompute_pool, gray, c)
        pools[name] = (c, pool)
        print(f"pool {name}: {dt:.2f} s", flush=True)

    # replay on the default pool, warm (run twice)
    c, pool = pools["default(pallas,oriented,f32,6144)"]
    for i in range(2):
        t0 = time.time()
        recs = freg.replay_from_pool(pool, n, (h, w), c)
        dt = time.time() - t0
        print(f"replay run{i}: {dt:.2f} s ok={sum(r.ok for r in recs)}/{len(recs)}",
              flush=True)


if __name__ == "__main__":
    main()
