"""Profile the warm corpus-scoring ESTOI section on the real chip.

BENCH_r03 corpus_warm_timing put estoi_s at 0.852 of 0.901 s total metric
device time for an 8-utterance chunk (haspi_s 0.025, siib_s 0.024).  This
breaks the section into its parts — the 16->10 kHz resample of the
noisy-enhanced signal, the pool-hit gather, and the degraded-half ESTOI
core — timed warm with real fetches (block_until_ready does not
synchronise through the tunnel).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from nelegan_tpu.dsp.resample import resample_poly
from nelegan_tpu.metrics.estoi import (
    estoi_10k, estoi_clean_10k, estoi_from_clean_10k)

B = 8
BLEN = 49152  # toy 2.1 s -> bucket 3*16384


def timed(label, fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label:36s} med {1000*ts[len(ts)//2]:8.2f} ms  "
          f"min {1000*ts[0]:8.2f}  max {1000*ts[-1]:8.2f}", flush=True)
    return out


def main():
    rng = np.random.RandomState(0)
    x = rng.randn(B, BLEN).astype(np.float32) * 0.1
    y = (x + 0.3 * rng.randn(B, BLEN).astype(np.float32) * 0.1)
    nv = np.full((B,), 34133, np.int32)
    xd, yd, nvd = jax.device_put((x, y, nv))
    nv10 = -(-nvd * 5 // 8)

    rs = jax.jit(lambda a: resample_poly(a, 5, 8))
    timed("resample 5/8 [8,49152]", rs, yd)

    x10 = jax.device_put(np.asarray(rs(xd)))
    y10 = jax.device_put(np.asarray(rs(yd)))

    clean_f = jax.jit(jax.vmap(estoi_clean_10k))
    ec = timed("estoi_clean (vmap)", clean_f, x10, nv10)
    ec = jax.tree.map(lambda a: jax.device_put(np.asarray(a)), ec)

    from_clean = jax.jit(jax.vmap(estoi_from_clean_10k))
    timed("estoi_from_clean (vmap)", from_clean, y10, ec, nv10)

    full = jax.jit(jax.vmap(estoi_10k))
    timed("estoi_10k full (vmap)", full, x10, y10, nv10)

    sect = jax.jit(lambda yy, cc, vv: jax.vmap(estoi_from_clean_10k)(
        resample_poly(yy, 5, 8), cc, vv))
    timed("resample+from_clean fused", sect, yd, ec, nv10)


if __name__ == "__main__":
    main()
