"""Quantitative ICI-traffic model: bytes per collective -> predicted
real-pod scaling efficiency (VERDICT r3 item 3 / next #4).

The virtual CPU mesh can only validate code paths — its wall-clock numbers
are host-core artifacts.  What IS hardware-independent is the communication
STRUCTURE: which collectives a step compiles to and how many bytes each
moves.  This module turns those bytes into a predicted efficiency on real
v5e ICI, published next to the measured virtual numbers so the >=80%
-at->=2-hosts BASELINE row rests on arithmetic, not vibes.

Bandwidth assumption (documented, conservative): TPU v5e exposes 1600 Gbps
of aggregate ICI per chip; a ring collective streams over one bidirectional
link pair at ~45 GB/s per direction (the "How to Scale Your Model" v5e
figure).  Per-collective launch latency ~1 us.

Model:  t_step(D) = t1/D + bytes_per_device(D)/ICI_BPS + n_coll * LAT
        efficiency(D) = t1 / (D * t_step(D))
with t1 the SINGLE-CHIP device time of the same step measured on the real
TPU (source stated in every published JSON).
"""
from __future__ import annotations

from typing import Dict, List

#: one-direction ring bandwidth per v5e chip (see module docstring)
V5E_ICI_BPS = 4.5e10
#: per-collective launch latency
COLLECTIVE_LAT_S = 1e-6


def ring_all_reduce_bytes(payload_bytes: float, d: int) -> float:
    """Bytes through EACH device's ICI for one ring all-reduce (psum)."""
    return 2.0 * payload_bytes * (d - 1) / max(d, 1)


def ring_all_gather_bytes(payload_bytes: float, d: int) -> float:
    """Bytes through each device for one ring all-gather of a sharded
    payload whose GLOBAL size is ``payload_bytes``."""
    return payload_bytes * (d - 1) / max(d, 1)


def predicted_efficiency(t1_device_s: float, d: int,
                         bytes_per_device: float, n_collectives: int
                         ) -> float:
    """Efficiency vs perfect scaling on real v5e ICI (see module model)."""
    if d <= 1:
        return 1.0
    t_comm = bytes_per_device / V5E_ICI_BPS + n_collectives * COLLECTIVE_LAT_S
    t_step = t1_device_s / d + t_comm
    return t1_device_s / (d * t_step)


def efficiency_table(t1_device_s: float, device_counts: List[int],
                     bytes_fn, n_collectives_fn) -> List[Dict]:
    """Per-D prediction rows: bytes_fn(d) -> per-device ICI bytes,
    n_collectives_fn(d) -> collective count per step."""
    rows = []
    for d in device_counts:
        b = float(bytes_fn(d))
        n = int(n_collectives_fn(d))
        rows.append({
            "n_devices": d,
            "modeled_ici_bytes_per_device": int(b),
            "n_collectives": n,
            "predicted_efficiency_v5e":
                round(predicted_efficiency(t1_device_s, d, b, n), 4),
        })
    return rows
