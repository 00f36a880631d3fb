"""Fine split of the warm corpus HASPI/SIIB/ESTOI sections on the chip.

prof_corpus.py showed the per-chunk (8 utts, bucket 49152) warm device
cost is HASPI ~157 ms, SIIB ~90 ms, ESTOI ~12 ms.  This times each piece
with the pipelined protocol (5 in-order dispatches, one fetch) so RTT
amortises: resamples, pool gathers, the metric cores — jitted vs the
production unjitted-vmap dispatch.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from nelegan_tpu.dsp.resample import resample_poly
from nelegan_tpu.metrics.estoi import estoi_clean_10k, estoi_from_clean_10k
from nelegan_tpu.metrics.haspi import (
    haspi_v2_clean_24k, haspi_v2_from_clean_24k, resample_to_24k)
from nelegan_tpu.metrics.siib import (
    siib_gauss_16k_with_klt, siib_klt_16k)

B, BLEN = 8, 49152
NV = 33600


def timed(label, fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        dt = (time.perf_counter() - t0) / reps
        best = dt if best is None else min(best, dt)
    print(f"{label:44s} {1000*best:8.2f} ms/call", flush=True)
    return out


def main():
    rng = np.random.RandomState(0)
    x = np.zeros((B, BLEN), np.float32)
    x[:, :NV] = rng.randn(B, NV).astype(np.float32) * 0.1
    y = x + 0.1 * np.abs(x)
    nv = np.full((B,), NV, np.int32)
    xd, yd, nvd = jax.device_put((x, y, nv))

    # --- resamples (jitted callables; production dispatches these raw) ---
    timed("resample 5/8 [8,49152]", lambda a: resample_poly(a, 5, 8), yd)
    timed("resample 3/2 [8,49152]", lambda a: resample_to_24k(a, 16000), yd)

    # --- ESTOI ---
    y10 = jax.device_put(np.asarray(resample_poly(yd, 5, 8)))
    nv10 = jax.device_put(np.asarray(-(-nv * 5 // 8)))
    ec = jax.jit(jax.vmap(estoi_clean_10k))(y10, nv10)
    ec = jax.tree.map(lambda a: jax.device_put(np.asarray(a)), ec)
    timed("estoi_from_clean  vmap-unjitted",
          lambda a, b, c: jax.vmap(estoi_from_clean_10k)(a, b, c),
          y10, ec, nv10)
    timed("estoi_from_clean  jit(vmap)",
          jax.jit(jax.vmap(estoi_from_clean_10k)), y10, ec, nv10)
    fe = jax.jit(lambda yy, cc, vv10: jax.vmap(estoi_from_clean_10k)(
        resample_poly(yy, 5, 8), cc, vv10))
    timed("estoi fused resample+metric (jit)", fe, yd, ec, nv10)

    # --- HASPI ---
    y24 = jax.device_put(np.asarray(resample_to_24k(yd, 16000)))
    nv24 = jax.device_put(np.asarray(-(-nv * 3 // 2)))
    cl = jax.jit(jax.vmap(lambda a, v: haspi_v2_clean_24k(a, n_valid=v)))(
        y24, nv24)
    cl = jax.tree.map(lambda a: jax.device_put(np.asarray(a)), cl)
    timed("haspi_from_clean  vmap-unjitted",
          lambda a, v, c: jax.vmap(
              lambda bb, vv, cc: haspi_v2_from_clean_24k(
                  bb, cc, n_valid=vv)[0])(a, v, c), y24, nv24, cl)
    timed("haspi_from_clean  jit(vmap)",
          jax.jit(jax.vmap(lambda bb, vv, cc: haspi_v2_from_clean_24k(
              bb, cc, n_valid=vv)[0])), y24, nv24, cl)
    fh = jax.jit(lambda yy, vv24, cc: jax.vmap(
        lambda bb, vv, c: haspi_v2_from_clean_24k(bb, c, n_valid=vv)[0])(
        resample_to_24k(yy, 16000), vv24, cc))
    try:
        timed("haspi fused resample+metric (jit)", fh, yd, nv24, cl)
    except Exception as e:
        print("haspi fused failed:", str(e)[:200])

    # --- SIIB (m_fac=1 for active signals: sb == BLEN) ---
    sv = jax.device_put(np.asarray(nv))
    u = jax.jit(jax.vmap(siib_klt_16k))(xd, sv)
    u = jax.tree.map(lambda a: jax.device_put(np.asarray(a)), u)
    timed("siib_with_klt  vmap-unjitted",
          lambda a, b, c, d: jax.vmap(siib_gauss_16k_with_klt)(a, b, c, d),
          xd, yd, sv, u)
    timed("siib_with_klt  jit(vmap)",
          jax.jit(jax.vmap(siib_gauss_16k_with_klt)), xd, yd, sv, u)

    def _tile_mod(sig, nvj, svj):
        idx = jnp.arange(BLEN) % jnp.maximum(nvj, 1)
        return sig[idx] * (jnp.arange(BLEN) < svj).astype(sig.dtype)

    fs_ = jax.jit(lambda a, b, v, s, uu: jax.vmap(siib_gauss_16k_with_klt)(
        jax.vmap(_tile_mod)(a, v, s), jax.vmap(_tile_mod)(b, v, s), s, uu))
    timed("siib fused tile+metric (jit)", fs_, xd, yd, nvd, sv, u)


if __name__ == "__main__":
    main()
