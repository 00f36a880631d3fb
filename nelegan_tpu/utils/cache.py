"""Persistent XLA compilation cache.

Remote TPU compiles take 30-240 s per program shape in this environment;
the persistent cache makes every rerun (training restarts, bench, CLIs)
reuse them.  Call once before heavy jit use; safe no-op if the backend
doesn't support serialisation.
"""
from __future__ import annotations

import os


def enable_compilation_cache(directory: str | None = None) -> str | None:
    directory = directory or os.environ.get(
        "NELE_COMPILE_CACHE",
        os.path.expanduser("~/.cache/nelegan_tpu_xla"))
    try:
        import jax
        os.makedirs(directory, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return directory
    except Exception:
        return None
