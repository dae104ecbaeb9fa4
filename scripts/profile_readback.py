"""Readback-throughput experiment: chunk size x thread count through the
tunnel (fps_readback_included sits at 4.18 vs the 4.5 target; readback is
pure tunnel time, so the only lever is transfer shape/concurrency)."""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from imagestitch_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

H, W = 11616, 8192        # ~panorama scale, uint8
x = jnp.zeros((H, W), jnp.uint8) + 7
np.asarray(x[:1, :1])
total_mb = H * W / 1e6
print(f"array {total_mb:.0f} MB, backend {jax.default_backend()}", flush=True)


def read_chunked(a, chunk_mb, threads):
    rows = max(1, int(chunk_mb * 1e6) // W)
    spans = [(s, min(s + rows, H)) for s in range(0, H, rows)]
    if threads <= 1:
        return [np.asarray(a[s:e]) for s, e in spans]
    with ThreadPoolExecutor(max_workers=threads) as ex:
        return list(ex.map(lambda se: np.asarray(a[se[0]:se[1]]), spans))


for chunk_mb in (8, 32, 96):
    for threads in (1, 2, 4):
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            read_chunked(x, chunk_mb, threads)
            best = min(best, time.time() - t0)
        print(f"chunk={chunk_mb}MB threads={threads}: {best:.2f}s "
              f"({total_mb/best:.1f} MB/s)", flush=True)

# monolithic for reference
t0 = time.time()
np.asarray(x)
print(f"monolithic: {time.time()-t0:.2f}s", flush=True)
