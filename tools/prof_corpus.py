"""Attribute the warm corpus-scoring device time per metric, honestly.

BENCH_r04 corpus_warm_timing: estoi_s=0.234 (min of 3) vs haspi_s=siib_s
=0.025 — contradicting tools/prof_estoi.py's finding that every ESTOI
section alone is RTT-bound at ~27 ms.  Hypothesis: score_corpus dispatches
ALL metric programs, then probes them in dispatch order — but the probe
itself is a queued device program, so the FIRST probe (ESTOI's) waits for
every metric's device work (FIFO execution), and later probes measure pure
RTT.  estoi_s was really "total metric device time".

This reproduces the bench's exact warm chunk and times it three ways:
  1. production order (probe after all dispatches)      -> r4's numbers
  2. inline probes (dispatch probe right after its metric) -> honest split
  3. each metric alone (no other programs queued)          -> ground truth
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from nelegan_tpu.metrics import score_corpus, LAST_TIMING
from nelegan_tpu.metrics.clean_pool import CleanSidePool


def main():
    import os
    rng = np.random.RandomState(0)
    n = 33600  # bench: 2.1 s @ 16 kHz -> bucket 49152
    clean = (rng.randn(n) * 0.1).astype(np.float32)
    noise = (rng.randn(n) * 0.1).astype(np.float32)
    cs = [clean * (0.9 + 0.01 * i) for i in range(8)]
    ns = [noise * 0.3] * 8
    es = [c * 0.9 for c in cs]
    ks = [f"u{i}" for i in range(8)]
    pool = CleanSidePool()
    sm = ("siib", "haspi", "estoi")
    for _ in range(2):
        score_corpus(cs, ns, es, norm=False, metrics=sm,
                     clean_cache=pool, clean_keys=ks)

    os.environ["NELE_SCORE_TIMING"] = "1"
    from nelegan_tpu import metrics as _m
    score_corpus(cs, ns, es, norm=False, metrics=sm,
                 clean_cache=pool, clean_keys=ks)  # probe-compile rep
    tmin: dict = {}
    for _ in range(3):
        score_corpus(cs, ns, es, norm=False, metrics=sm,
                     clean_cache=pool, clean_keys=ks)
        for k, v in _m.LAST_TIMING.items():
            if isinstance(v, float):
                tmin[k] = min(v, tmin.get(k, v))
    print("production timing (min of 3):", tmin, flush=True)
    del os.environ["NELE_SCORE_TIMING"]

    # ground truth: each metric ALONE (nothing else queued), warm pool
    for only in ("estoi", "haspi", "siib"):
        for _ in range(1):
            score_corpus(cs, ns, es, norm=False, metrics=(only,),
                         clean_cache=pool, clean_keys=ks)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            score_corpus(cs, ns, es, norm=False, metrics=(only,),
                         clean_cache=pool, clean_keys=ks)
            reps.append(time.perf_counter() - t0)
        print(f"{only} alone: min {1000*min(reps):.1f} ms "
              f"med {1000*sorted(reps)[1]:.1f} ms", flush=True)

    # all three together, end-to-end (what production pays per chunk)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        score_corpus(cs, ns, es, norm=False, metrics=sm,
                     clean_cache=pool, clean_keys=ks)
        reps.append(time.perf_counter() - t0)
    print(f"all three e2e: min {1000*min(reps):.1f} ms "
          f"med {1000*sorted(reps)[1]:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
