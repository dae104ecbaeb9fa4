"""Benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: stitch throughput (frames/s) on the 90-image dendritic grid
(register + compose, device-resident batch; decode excluded, matching the
reference's own phase timers at Stitcher.py:80-90).

vs_baseline compares against a serial CPU implementation of the same
registration/composition semantics (cv2.phaseCorrelate per attempt + numpy
canvas), measured once on this machine and cached in baselines/cpu_ref.json —
the reference itself cannot run here (its cv2.xfeatures2d.SURF and np.int
dependencies are gone), so its serial CPU pipeline is reproduced faithfully.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

DEMO = "/root/reference/demoImages"
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "baselines", "cpu_ref.json")


def _load_dendritic():
    from imagestitch_tpu.io import dataset
    files = dataset.list_project_images(os.path.join(DEMO, "dendriticCrystal"), 1)
    batch = dataset.load_batch(files, color_mode=False)
    return batch


def _cpu_reference_seconds(gray: np.ndarray) -> float:
    """Serial CPU pipeline with reference semantics (one pass, timed)."""
    import cv2

    h, w = gray.shape[1:3]
    t0 = time.time()
    offsets = []
    direction = 1
    for k in range(gray.shape[0] - 1):
        a, b = gray[k], gray[k + 1]
        found = False
        for i in (1, 2, 3):
            ratio = 0.2 * i
            local = direction
            while True:
                L = int(np.floor((h if local in (1, 3) else w) * ratio))
                if local == 1:
                    ra, rb = a[h - L:, :], b[:L, :]
                elif local == 2:
                    ra, rb = a[:, w - L:], b[:, :L]
                elif local == 3:
                    ra, rb = a[:L, :], b[h - L:, :]
                else:
                    ra, rb = a[:, :L], b[:, w - L:]
                (x, y), resp = cv2.phaseCorrelate(np.float64(ra), np.float64(rb))
                if resp > 0.15:
                    if local == 1:
                        off = (int(y) + h - int(ratio * h), int(x))
                    elif local == 2:
                        off = (int(y), int(x) + w - int(ratio * w))
                    elif local == 3:
                        off = (int(y) - (h - int(ratio * h)), int(x))
                    else:
                        off = (int(y), int(x) - (w - int(ratio * w)))
                    offsets.append(off)
                    direction = local
                    found = True
                    break
                local = local % 4 + 1
                if local == direction:
                    break
            if found:
                break
        if not found:
            offsets.append((0, 0))
    # serial numpy compose (overwrite paste, the cheapest possible fusion)
    pos = np.concatenate([[[0, 0]], np.cumsum(offsets, axis=0)])
    pos -= pos.min(axis=0)
    canvas = np.zeros((pos[:, 0].max() + h, pos[:, 1].max() + w), np.uint8)
    for k in range(gray.shape[0]):
        r, c = pos[k]
        canvas[r:r + h, c:c + w] = gray[k]
    return time.time() - t0


def main():
    import jax
    from imagestitch_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from imagestitch_tpu import StitchConfig, compose
    from imagestitch_tpu.core import registration

    batch = _load_dendritic()
    gray_host = batch.gray
    n = gray_host.shape[0]
    cfg = StitchConfig(registration="phase_incre", direction=1, direct_incre=1,
                       roi_ratio=0.2, color_mode=False, fuse_method="notFuse")

    # ship the dataset to HBM once (the reference re-decodes per pass;
    # we re-register from the device-resident batch)
    gray = jax.device_put(gray_host)
    jax.block_until_ready(gray)

    # warm-up (compile everything once)
    recs = registration.register_sequence_phase(gray, cfg)
    ok_offsets = [r.offset for r in recs if r.ok]

    def run_once() -> float:
        t0 = time.time()
        recs = registration.register_sequence_phase(gray, cfg)
        # compose the longest registered segment
        segs = []
        start = 0
        for k, r in enumerate(recs):
            if not r.ok:
                segs.append((start, k + 1))
                start = k + 1
        segs.append((start, n))
        s, e = max(segs, key=lambda t: t[1] - t[0])
        offs = [recs[k].offset for k in range(s, e - 1)]
        img = compose(gray[s:e], offs, cfg)
        return time.time() - t0

    times = [run_once() for _ in range(3)]
    dt = min(times)
    fps = n / dt

    os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            base = json.load(f)
    else:
        base_dt = _cpu_reference_seconds(gray)
        base = {"dendritic_phase_notfuse_s": base_dt, "n_frames": int(n)}
        with open(BASELINE_CACHE, "w") as f:
            json.dump(base, f)
    base_fps = base["n_frames"] / base["dendritic_phase_notfuse_s"]

    print(json.dumps({
        "metric": "dendritic 89-frame stitch throughput (register+compose)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / base_fps, 3),
    }))


if __name__ == "__main__":
    main()
