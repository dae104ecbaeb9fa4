"""Registration checkpoint / resume.

New subsystem (SURVEY §5: the reference has no checkpointing; its closest
analog is the ``startNum`` project offset, Stitcher.py:129).  The offset/pose
table of a registered sequence is tiny; persisting it lets composition — or a
re-fusion with a different blend mode — run without re-registration, and
lets a failed multi-dataset run resume mid-flight.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional

import numpy as np

from ..core.registration import PairRegistration

_VERSION = 1


def save_registration(path: str, files: List[str],
                      records: List[PairRegistration]) -> None:
    payload = {
        "version": _VERSION,
        "files": list(files),
        "records": [dataclasses.asdict(r) for r in records],
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_registration(path: str, files: Optional[List[str]] = None
                      ) -> Optional[List[PairRegistration]]:
    """Load a checkpoint; returns None when absent or when ``files`` no
    longer match the checkpointed sequence (stale checkpoint)."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        payload = json.load(f)
    if payload.get("version") != _VERSION:
        return None
    if files is not None and list(files) != payload["files"]:
        return None
    out = []
    for d in payload["records"]:
        d["offset"] = tuple(d["offset"])
        d["offset_subpix"] = tuple(d["offset_subpix"])
        out.append(PairRegistration(**d))
    return out
