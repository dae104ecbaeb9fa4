"""Persistent XLA compilation cache.

The TPU in this environment compiles through a remote tunnel (minutes per
cold kernel); caching serialized executables on disk makes every process
after the first start warm.  Call once before the first dispatch.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str = _DEFAULT) -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax: flag names differ; cold compiles still work
