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

Tried and rejected (r4, measured on the tunnel-attached v5e): a threaded
compile warm-up that dispatches the run's known program shapes from a
thread pool before epoch 1.  Three distinct fresh programs compiled in
3.4 s serially vs 4.7 s from 3 threads (0.73x) — the remote compile
service serialises requests (or the client does), so concurrency only
adds tracing/GIL overhead.  Re-try only if the axon backend starts
serialising executables or its compile service becomes concurrent.
"""
from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    """Stable per-host tag for the cache directory.  XLA:CPU serialises
    AOT executables specialised to the *compiling* machine's CPU
    features; loading them on a host with different features fails per
    entry with a cpu_aot_loader error ("Machine type used for XLA:CPU
    compilation doesn't match...") — measured here when round 2's
    many-core AVX512-everything box filled the cache and round 3's box
    (fewer features) then paid a rejected load + warning spew for every
    entry.  Driver hosts change across rounds, so entries must not be
    shared between hosts: key a subdirectory by machine + CPU flags."""
    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    bits.append(" ".join(sorted(line.split(":", 1)[1]
                                                .split())))
                    break
    except OSError:
        bits.append(platform.processor())
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def enable_compilation_cache(directory: str | None = None) -> str | None:
    """NELE_COMPILE_CACHE=off (or 0/none) disables the persistent cache
    entirely: its zstandard read/write paths have crashed the process on
    some hosts (a corrupt entry SIGABRTs the reader; one box segfaulted
    in put_executable_and_time while writing) — tests/conftest.py opts
    out, trading warm-rerun compile time for reliability."""
    directory = directory or os.environ.get(
        "NELE_COMPILE_CACHE",
        os.path.expanduser("~/.cache/nelegan_tpu_xla"))
    if str(directory).lower() in ("off", "0", "none", "disabled"):
        return None
    directory = os.path.join(directory, f"host-{_host_fingerprint()}")
    try:
        import jax
        os.makedirs(directory, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return directory
    except Exception:
        return None
