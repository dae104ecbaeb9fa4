"""Scaling-efficiency harness (BASELINE: frames/s at 1 chip / N devices).

Measures the data-parallel registration step's throughput versus mesh size.
On real pods the numbers are the BASELINE scaling-efficiency metric; on the
virtual CPU mesh the harness validates the sharded code path end-to-end
(virtual-device wall clock is NOT a hardware efficiency claim — chips share
the host CPU — so the report marks the backend).
"""
from __future__ import annotations

import dataclasses
import json
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from ..parallel import pipeline
from ..parallel.mesh import make_mesh


@dataclasses.dataclass
class ScalingPoint:
    n_devices: int
    frames_per_s: float
    efficiency_vs_1: float
    collectives: Optional[Dict[str, int]] = None   # compiled-HLO op counts
    dispatches_per_step: int = 1
    # quantitative ICI model (eval/ici_model.py): bytes each device moves
    # over ICI per step, and the efficiency that traffic predicts on REAL
    # v5e links given the stated single-chip step time — the virtual-mesh
    # wall clock validates the code path, this predicts the hardware
    modeled_ici_bytes_per_device: Optional[int] = None
    predicted_efficiency_v5e: Optional[float] = None


@dataclasses.dataclass
class ScalingReport:
    backend: str
    mode: str
    n_frames: int
    image_shape: List[int]
    points: List[ScalingPoint]
    host_cores: Optional[int] = None
    note: str = ""
    # source of the single-chip step time feeding predicted_efficiency_v5e
    t1_device_s: Optional[float] = None
    t1_source: str = ""


def run(images: Optional[np.ndarray] = None, device_counts=None,
        direction: int = 1, ratio: float = 0.25, repeats: int = 3,
        mode: str = "phase",
        t1_device_s: Optional[float] = None,
        t1_source: str = "") -> ScalingReport:
    """Throughput vs mesh size for one registration sweep.

    mode = "phase" (FFT pair registration) or "feature" (the flagship:
    frame-sharded detect/describe + halo'd matching + mode vote).
    ``t1_device_s``: single-chip step seconds measured on REAL hardware,
    feeding the predicted v5e efficiency (defaults to this run's 1-device
    time — correct on TPU, structural-only on the virtual CPU mesh).
    """
    from . import ici_model
    cfg = None
    if images is None:
        rng = np.random.default_rng(0)
        if mode == "feature":
            # detection is conv-heavy; keep the CPU-mesh validation run small
            # (on real chips pass real frames via ``images``)
            base = rng.integers(0, 255, (48 * 17 + 256, 384), np.uint8)
            images = np.stack([base[48 * i:48 * i + 256] for i in range(17)])
        else:
            base = rng.integers(0, 255, (80 * 33 + 512, 768), np.uint8)
            images = np.stack([base[80 * i:80 * i + 512] for i in range(33)])
        if mode == "feature":
            # synthetic CPU-mesh validation path only: shrink the keypoint
            # pool so the virtual mesh sweep stays fast.  Real-frame runs
            # (images passed in) keep the production FeatureConfig.
            from ..config import FeatureConfig, StitchConfig
            cfg = StitchConfig(features=FeatureConfig(
                pool_keypoints=512, max_keypoints=256))
    n = images.shape[0]
    avail = jax.device_count()
    device_counts = device_counts or [d for d in (1, 2, 4, 8, 16, 32)
                                      if d <= avail]
    points = []
    fps1 = None
    for d in device_counts:
        mesh = make_mesh(d, axis="pairs")

        if mode == "feature":
            def step():
                return pipeline.register_pairs_sharded_features(
                    images, mesh, cfg=cfg, direction=direction, ratio=ratio)
        else:
            a, b, n_pairs = pipeline.make_pair_tensors(images, mesh)

            def step():
                out = pipeline.register_pairs_sharded(a, b, direction, ratio)
                jax.block_until_ready(out)
                return out

        step()  # warm-up / compile
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            step()
            best = min(best, time.perf_counter() - t0)
        fps = n / best
        if fps1 is None:
            fps1 = fps
            t1_s = best
        colls = None
        if mode == "phase":
            from ..utils import hlo
            probe = jax.jit(lambda u, v: pipeline.register_pairs_sharded(
                u, v, direction, ratio))
            colls = hlo.count_collectives(probe, a, b)
        else:
            colls = pipeline.feature_step_collectives(
                images, mesh, cfg=cfg, direction=direction, ratio=ratio)
        # ICI bytes model (eval/ici_model.py): phase moves only the three
        # (P,)-float output all-gathers; feature (r5 explicit-halo
        # shard_map step) moves ONLY one frame's selected B-side strip
        # features per shard boundary — rows f32 + cols f32 + valid pred +
        # descs f32[k_sel, D] — outputs stay sharded (validated against
        # compiled HLO at 2/4/8 devices: eval/hlo_validation.py)
        n_pairs_g = n - 1
        if mode == "phase":
            out_bytes = 3 * n_pairs_g * 4
            b_dev = ici_model.ring_all_gather_bytes(out_bytes, d)
        else:
            k_sel = 256 if cfg else 1024
            desc_dim = 128
            b_dev = k_sel * (4 + 4 + 1 + desc_dim * 4)
        n_coll = int((colls or {}).get("total", 3))
        points.append(ScalingPoint(
            n_devices=d, frames_per_s=round(fps, 2),
            efficiency_vs_1=round(fps / (fps1 * d), 3),
            collectives=colls, dispatches_per_step=1,
            modeled_ici_bytes_per_device=int(b_dev),
            predicted_efficiency_v5e=round(ici_model.predicted_efficiency(
                t1_device_s if t1_device_s else t1_s, d, b_dev, n_coll), 4)))
    import os as _os
    cores = _os.cpu_count()
    note = ""
    if jax.default_backend() == "cpu":
        note = (f"virtual CPU mesh on a {cores}-core host: XLA:CPU runs each "
                f"device's program on ~one thread while the 1-device program "
                f"uses the whole intra-op pool, so absolute wall-clock at "
                f"D>1 is a backend artifact, not a hardware scaling claim; "
                f"the apples-to-apples point is D == cores with amortized "
                f"work, and the compiled collective counts are the "
                f"hardware-independent evidence (the phase step's only "
                f"collectives are three (P,)-vector output all-gathers)")
    return ScalingReport(backend=jax.default_backend(), mode=mode,
                         n_frames=n, image_shape=list(images.shape[1:]),
                         points=points, host_cores=cores, note=note,
                         t1_device_s=round(t1_device_s or t1_s, 4),
                         t1_source=t1_source or
                         f"1-device step time measured on this run's "
                         f"{jax.default_backend()} backend")


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="phase", choices=["phase", "feature"])
    p.add_argument("--cpu-mesh", action="store_true",
                   help="force the virtual CPU mesh (needs "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N; "
                        "must run before any backend initializes)")
    p.add_argument("--devices", type=int, nargs="*",
                   help="explicit mesh sizes (e.g. --devices 1 for a "
                        "core-pinned thread-normalized baseline run under "
                        "taskset)")
    p.add_argument("--out")
    args = p.parse_args()
    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
    rep = run(mode=args.mode, device_counts=args.devices)
    txt = json.dumps(dataclasses.asdict(rep))
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt)
    print(txt)


if __name__ == "__main__":
    main()
