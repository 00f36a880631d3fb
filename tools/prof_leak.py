"""Characterise the remote-tunnel client's host-memory retention.

The 500-epoch campaign was OOM-killed at epoch 251 with 130 GB RSS on a
125 GB host (dmesg oom-kill of the python process).  Training-loop probes
showed ~34-40 MB/epoch of warm growth at 1/10 reference scale that
neither gc.collect() nor malloc_trim(0) reclaimed; this probe isolates
the mechanism with raw device ops:

  measured on the axon tunnel (v5e, 2026-08-21):
    * 80k tiny jitted executions      -> +78 MB   (~1 KB / execution)
    * 2000 4 MB outputs (device-only) -> +2 MB    (outputs don't leak)
    * 300 4 MB device->host fetches   -> +12 MB   (fetches barely leak)
    * 300 4 MB host->device uploads   -> +1.6 GB  (UPLOADS RETAINED ~1:1)
    * 6000 4 KB uploads               -> +22 MB   (~1x bytes + overhead)
    * 1500 256 KB uploads             -> +386 MB  (~1x bytes)

Every `jax.device_put` (and every numpy argument to a jitted call) is
retained by the client for the life of the process, independent of the
Python array's lifetime.  Mitigations in the package: immutable signals
live in device pools (uploaded once), PCM16 int16 upload paths halve the
retained bytes (pipeline.featurize_batch inputs, score_corpus packing,
the replay D pass's enhanced wavs — train/loop.py _eb_keys_compute), and
long campaigns resume from per-epoch checkpoints after a relaunch
(tools/make_training_report.py), so shedding the leak is one process
restart, not lost work.
"""
from __future__ import annotations

import numpy as np
import jax


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        return int([ln for ln in f if ln.startswith("VmRSS")][0]
                   .split()[1]) / 1e6


def main():
    f = jax.jit(lambda a: a * 1.0000001)
    y = f(jax.device_put(np.ones(256, np.float32)))
    np.asarray(y)
    print(f"warm: {rss_gb():.3f} GB", flush=True)
    for r in range(4):
        for _ in range(20000):
            y = f(y)
        np.asarray(y)
        print(f"after {20000 * (r + 1)} tiny execs: {rss_gb():.3f} GB",
              flush=True)

    g = jax.jit(lambda a: a + 1.0)
    w = g(jax.device_put(np.ones((1024, 1024), np.float32)))
    np.asarray(w[:1, :1])
    print(f"warm big: {rss_gb():.3f} GB", flush=True)
    for r in range(4):
        for _ in range(500):
            w = g(w)
        np.asarray(w[:1, :1])
        print(f"after {500 * (r + 1)} 4MB execs: {rss_gb():.3f} GB",
              flush=True)
    for r in range(3):
        for _ in range(100):
            _ = np.asarray(w)
        print(f"after {100 * (r + 1)} 4MB fetches: {rss_gb():.3f} GB",
              flush=True)
    h = np.ones((1024, 1024), np.float32)
    for r in range(3):
        for _ in range(100):
            d = jax.device_put(h)
            del d
        print(f"after {100 * (r + 1)} 4MB uploads: {rss_gb():.3f} GB",
              flush=True)


if __name__ == "__main__":
    main()
