"""Post-optimisation warm corpus measurement (round 5).

Measures, on the chip:
  1. warm all-section timing of the bench corpus chunk (honest per-metric
     device split via the paired-probe NELE_SCORE_TIMING),
  2. warm HASPI degraded-side throughput at the bench shape,
  3. vmap_chunk 8 vs 16 A/B on warm SIIB+HASPI+ESTOI corpus scoring
     (VERDICT r4 #8a: wider chunks amortise fixed per-dispatch cost).
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from nelegan_tpu.metrics import score_corpus
from nelegan_tpu.metrics.clean_pool import CleanSidePool


def main():
    rng = np.random.RandomState(0)
    n = 33600
    clean = (rng.randn(n) * 0.1).astype(np.float32)
    noise = (rng.randn(n) * 0.1).astype(np.float32)
    sm = ("siib", "haspi", "estoi")

    for width in (8, 16):
        cs = [clean * (0.9 + 0.005 * i) for i in range(width)]
        ns = [noise * 0.3] * width
        es = [c * 0.9 for c in cs]
        ks = [f"u{i}" for i in range(width)]
        pool = CleanSidePool()
        for _ in range(2):
            score_corpus(cs, ns, es, norm=False, metrics=sm,
                         clean_cache=pool, clean_keys=ks,
                         vmap_chunk=width)
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            score_corpus(cs, ns, es, norm=False, metrics=sm,
                         clean_cache=pool, clean_keys=ks,
                         vmap_chunk=width)
            reps.append(width / (time.perf_counter() - t0))
        reps.sort()
        print(f"warm corpus width={width}: med {reps[len(reps)//2]:.1f} "
              f"utt/s (min {reps[0]:.1f} max {reps[-1]:.1f})", flush=True)
        if width == 8:
            os.environ["NELE_SCORE_TIMING"] = "1"
            from nelegan_tpu import metrics as _m
            score_corpus(cs, ns, es, norm=False, metrics=sm,
                         clean_cache=pool, clean_keys=ks)
            tmin: dict = {}
            for _ in range(3):
                score_corpus(cs, ns, es, norm=False, metrics=sm,
                             clean_cache=pool, clean_keys=ks)
                for k, v in _m.LAST_TIMING.items():
                    if isinstance(v, float):
                        tmin[k] = min(v, tmin.get(k, v))
            del os.environ["NELE_SCORE_TIMING"]
            print("warm section minima:", tmin, flush=True)

    # HASPI degraded-side warm at the bench shape (n24 = 50400)
    from nelegan_tpu.metrics.haspi import (haspi_v2_clean_24k,
                                           haspi_v2_from_clean_24k)
    n24 = 50400
    y = (rng.randn(8, n24) * 0.1).astype(np.float32)
    nv = np.full((8,), n24, np.int32)
    yd, nvd = jax.device_put((y, nv))
    cl = jax.jit(jax.vmap(lambda a, v: haspi_v2_clean_24k(a, n_valid=v)))(
        yd, nvd)
    cl = jax.tree.map(lambda a: jax.device_put(np.asarray(a)), cl)
    hd = jax.jit(jax.vmap(lambda b, v, c: haspi_v2_from_clean_24k(
        b, c, n_valid=v)[0]))
    _ = np.asarray(hd(yd, nvd, cl))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            s = hd(yd, nvd, cl)
        np.asarray(s)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"haspi_degraded warm: {40 / best:.1f} scores/s "
          f"({1000 * best / 40:.2f} ms/signal)", flush=True)


if __name__ == "__main__":
    main()
