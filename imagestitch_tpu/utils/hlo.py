"""Compiled-HLO introspection: collective-op accounting.

The scaling/compose harnesses publish how many cross-device collectives a
sharded step actually compiles to (VERDICT r2 item 4) — claims like "the
phase path is communication-free DP" become checkable numbers.
"""
from __future__ import annotations

import re
from typing import Dict

_COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
                "collective-permute", "reduce-scatter")


def collective_counts_from_text(hlo: str) -> Dict[str, int]:
    out = {}
    for op in _COLLECTIVES:
        # count op instructions, not strings in metadata: "  %x = ... op("
        n = len(re.findall(rf"\b{op}(?:-start)?\(", hlo))
        if n:
            out[op] = n
    out["total"] = sum(out.values())
    return out


def count_collectives(jitted_fn, *args, **kwargs) -> Dict[str, int]:
    """Lower+compile ``jitted_fn(*args)`` and count collective ops."""
    compiled = jitted_fn.lower(*args, **kwargs).compile()
    texts = compiled.as_text()
    if isinstance(texts, (list, tuple)):
        texts = "\n".join(texts)
    return collective_counts_from_text(texts)
