"""Regenerate the virtual-CPU-mesh scaling/compose baselines with the
round-4 ICI-bytes model and real-TPU t1 anchors
(baselines/scaling_t1_tpu.json -> predicted_efficiency_v5e).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python scripts/regen_scaling_r4.py
"""
import dataclasses
import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

BASE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "baselines")
T1 = json.load(open(os.path.join(BASE, "scaling_t1_tpu.json")))
SRC = "single-chip TPU v5e measurement (baselines/scaling_t1_tpu.json)"

from imagestitch_tpu.eval import compose_bench, scaling


def save(name, rep):
    with open(os.path.join(BASE, name), "w") as f:
        json.dump(dataclasses.asdict(rep), f, indent=2)
    print(name, "->", json.dumps(dataclasses.asdict(rep))[:300], flush=True)


rep = scaling.run(repeats=3, t1_device_s=T1["phase_t1_s"], t1_source=SRC)
save("scaling_phase_cpu_mesh.json", rep)

rng = np.random.default_rng(0)
base = rng.integers(0, 255, (80 * 129 + 512, 768), np.uint8)
images = np.stack([base[80 * i:80 * i + 512] for i in range(129)])
rep = scaling.run(images, device_counts=[1, 2, 8], repeats=3,
                  t1_device_s=T1["phase_t1_s"] * 128 / 32,
                  t1_source=SRC + " scaled by pair count 128/32")
save("scaling_phase_cpu_mesh_large.json", rep)

rep = scaling.run(repeats=3, mode="feature",
                  t1_device_s=T1["feature_t1_s"], t1_source=SRC)
save("scaling_feature_cpu_mesh.json", rep)

rep = compose_bench.run(t1_device_s=T1["compose_t1_s"], t1_source=SRC)
save("compose_bench_cpu_mesh.json", rep)
print("DONE", flush=True)
