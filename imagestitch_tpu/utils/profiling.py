"""Profiling and throughput measurement.

Upgrade over the reference's wall-clock prints (reference: Stitcher.py:61-90,
:166-182): fenced phase timers (``block_until_ready`` so async dispatch can't
lie), a frames/s meter, and a jax.profiler trace context for TPU timelines.
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


@dataclass
class PhaseTimer:
    """Named phase spans; device-fenced when given result handles."""
    spans: Dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, fence=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            self.spans[name] = self.spans.get(name, 0.0) + time.perf_counter() - t0

    def fence(self, name: str, value):
        """Time until ``value`` is device-complete, attributed to ``name``."""
        t0 = time.perf_counter()
        jax.block_until_ready(value)
        self.spans[name] = self.spans.get(name, 0.0) + time.perf_counter() - t0
        return value

    def report(self) -> str:
        return json.dumps({k: round(v, 4) for k, v in self.spans.items()})


def frames_per_second(n_frames: int, fn, *args, repeats: int = 3,
                      **kwargs) -> float:
    """Best-of-N fenced throughput of ``fn(*args)`` processing n_frames."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return n_frames / best


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
