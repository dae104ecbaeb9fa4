"""One-shot round-3 evidence run (single process, one backend init):
  1. detector-mode accuracy columns  -> baselines/accuracy_modes_tpu.json
  2. dendritic drift chain-vs-solved -> baselines/drift_dendritic.json
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from imagestitch_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

BASE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "baselines")

t0 = time.time()
from imagestitch_tpu.eval import accuracy

res = accuracy.run_modes()
payload = {m: {k: dataclasses.asdict(v) for k, v in r.items()}
           for m, r in res.items()}
with open(os.path.join(BASE, "accuracy_modes_tpu.json"), "w") as f:
    json.dump(payload, f, indent=2)
print(f"modes done in {time.time()-t0:.0f}s", flush=True)
for m, r in res.items():
    for k, v in r.items():
        print(m, k, v.num_ok, v.mean_abs_err_px, v.within_1px,
              v.compared_pairs, flush=True)

t0 = time.time()
from imagestitch_tpu.eval import loop_closure_demo

rep = loop_closure_demo.run()
with open(os.path.join(BASE, "drift_dendritic.json"), "w") as f:
    json.dump(dataclasses.asdict(rep), f, indent=2)
print(f"drift done in {time.time()-t0:.0f}s", flush=True)
print(json.dumps(dataclasses.asdict(rep)), flush=True)
