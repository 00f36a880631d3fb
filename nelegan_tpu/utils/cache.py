"""Persistent XLA compilation cache.

Remote TPU compiles take 30-240 s per program shape in this environment
(and far worse under remote-service load: a trivial jit measured 319 s at
one point); the persistent cache makes reruns (training restarts, bench,
CLIs) reuse compiled programs where the backend supports executable
serialisation.  Measured caveat: the axon remote-TPU backend does NOT
serialise executables (a fresh-shape TPU compile writes zero cache
entries), so only CPU programs persist — fresh-process TPU cold starts
pay full remote compiles regardless.  The mitigations that do work are
structural and already in place: fixed-width bucket padding, power-of-two
chunk widths, and shape-stable per-epoch programs, which bound the number
of distinct compiles per run.
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
