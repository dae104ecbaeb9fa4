"""Why is the pipelined ingest 11 s in one process and 38 s in another?

Runs the same stitch_from_files-equivalent TWICE at process start (after
minimal warm-up) and TWICE after a bench-style resident-batch stitch, to
separate code effects from process-state effects (allocator pressure,
dispatch queue, tunnel state)."""
import dataclasses, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from imagestitch_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from imagestitch_tpu import StitchConfig, compose
from imagestitch_tpu.core import feature_registration as freg
from imagestitch_tpu.io import dataset, prefetch

files = dataset.list_project_images(
    "/root/reference/demoImages/dendriticCrystal", 1)
n = len(files)
cfg = StitchConfig(registration="feature_incre", direction=1, direct_incre=1,
                   roi_ratio=0.2, color_mode=False)


def fence(x):
    for l in jax.tree_util.tree_leaves(x):
        if hasattr(l, "block_until_ready"):
            np.asarray(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32)))


def segments(recs, n):
    segs, start = [], 0
    for k, r in enumerate(recs):
        if not r.ok:
            segs.append((start, k + 1))
            start = k + 1
    segs.append((start, n))
    return segs


def stitch_from_files():
    t0 = time.time()
    recs, gray_dev, _ = prefetch.register_sequence_pipelined(files, cfg)
    outs = []
    for s, e in segments(recs, n):
        if e - s < 2:
            continue
        offs = [recs[k].offset for k in range(s, e - 1)]
        outs.append(compose(gray_dev[s:e], offs, cfg, return_device=True))
    fence(outs)
    return time.time() - t0


print("backend", jax.default_backend(), flush=True)
for k in range(3):
    print(f"early run {k}: {stitch_from_files():.2f} s", flush=True)

# now create bench-like resident state: monolithic batch + warm stitch
batch = dataset.load_batch(files, color_mode=False)
gray = jnp.concatenate([jax.device_put(batch.gray[s:s + 8])
                        for s in range(0, n, 8)])
fence(gray)
recs = freg.register_sequence_features_incre(gray, cfg)
outs = [compose(gray[s:e], [recs[k].offset for k in range(s, e - 1)], cfg,
                return_device=True)
        for s, e in segments(recs, n) if e - s >= 2]
fence(outs)
print("resident stitch done", flush=True)
for k in range(2):
    print(f"late run {k}: {stitch_from_files():.2f} s", flush=True)
