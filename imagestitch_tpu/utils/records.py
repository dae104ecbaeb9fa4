"""Structured observability records.

Upgrade of the reference's print-only logging (reference:
ImageUtility.py:52-64 printAndWrite; per-pair offsets logged at
Stitcher.py:303, :366): every registration attempt produces a structured
per-pair record (offset, confidence, direction, scale, attempt count) plus
sequence-level timing, serializable to JSON for the perf/accuracy harnesses.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Tuple


def print_and_write(cfg, message: str) -> None:
    """The reference's dual logging sink (ImageUtility.py:52-64): print to
    stdout when ``print_log``; append to ``output_address/evaluate_file``
    when ``evaluate`` (open/append/close per call, exactly as the reference
    does — the file is a runnable audit trail, not a held handle)."""
    if cfg.print_log:
        print(message)
    if cfg.evaluate:
        os.makedirs(cfg.output_address, exist_ok=True)
        path = os.path.join(cfg.output_address, cfg.evaluate_file)
        with open(path, "a") as f:
            f.write(str(message) + "\n")


@dataclasses.dataclass
class SequenceReport:
    num_pairs: int
    num_ok: int
    offsets: List[Tuple[int, int]]
    confidences: List[float]
    directions: List[int]
    scales: List[int]
    attempts: List[int]
    t_register: float = 0.0
    t_compose: float = 0.0

    @classmethod
    def from_records(cls, records, t_register: float = 0.0,
                     t_compose: float = 0.0) -> "SequenceReport":
        return cls(
            num_pairs=len(records),
            num_ok=sum(1 for r in records if r.ok),
            offsets=[tuple(r.offset) for r in records],
            confidences=[float(r.confidence) for r in records],
            directions=[int(r.direction) for r in records],
            scales=[int(r.scale) for r in records],
            attempts=[int(r.attempts) for r in records],
            t_register=t_register,
            t_compose=t_compose,
        )

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "SequenceReport":
        with open(path) as f:
            d = json.load(f)
        d["offsets"] = [tuple(o) for o in d["offsets"]]
        return cls(**d)
