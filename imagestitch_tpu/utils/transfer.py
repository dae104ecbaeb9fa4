"""Device->host transfer shaping.

The emulation tunnel (and, far more mildly, real PCIe) moves one monolithic
hundreds-of-MB readback much slower than concurrent medium-sized slices:
measured on the v5e tunnel (scripts/profile_readback.py), a ~95 MB array
reads at ~13 MB/s monolithic-chunked single-stream but ~33 MB/s with two
concurrent 32 MB row-slice streams.  ``read_back`` applies that shape; on
real hosts the overhead is one extra concatenate.
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

#: measured sweet spot on the tunnel (r5 re-measurement on the 147 MB
#: visible-piece stream: 1t 13.7 / 2t 18.5 / 3t 28.4 / 4t+ see
#: baselines/pool_profile_r5_tpu.json; the r3 "4 streams contend" result
#: no longer reproduces)
CHUNK_BYTES = 32 << 20
THREADS = 4


def read_back(array, chunk_bytes: int = CHUNK_BYTES,
              threads: int = THREADS) -> np.ndarray:
    """Materialize a device array on host via concurrent row-slice reads."""
    shape = array.shape
    if not shape:
        return np.asarray(array)
    row_bytes = int(np.prod(shape[1:], dtype=np.int64)) * array.dtype.itemsize
    rows = max(1, chunk_bytes // max(row_bytes, 1))
    if rows >= shape[0]:
        return np.asarray(array)
    spans = [(s, min(s + rows, shape[0]))
             for s in range(0, shape[0], rows)]
    if threads <= 1:
        parts = [np.asarray(array[s:e]) for s, e in spans]
    else:
        with ThreadPoolExecutor(max_workers=threads) as ex:
            parts = list(ex.map(lambda se: np.asarray(array[se[0]:se[1]]),
                                spans))
    return np.concatenate(parts)
