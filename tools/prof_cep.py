"""Split cep_coef vs mod_filt_corr cost on the chip (37 ms/chunk warm)."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from nelegan_tpu.metrics.haspi import chains

B = 8
NSUB = 7863  # 73728 @ 24k -> 2560 Hz subsampled
NB = 32


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
    xlp = (rng.rand(B, NSUB, NB) * 40).astype(np.float32)
    ylp = (rng.rand(B, NSUB, NB) * 40).astype(np.float32)
    xd, yd = jax.device_put((xlp, ylp))

    cep = jax.jit(jax.vmap(lambda a, b: chains.cep_coef(a, b, 2.5, 0.1, 6)))
    xcep, ycep, count = timed("cep_coef (argsort+gather+matmul)", cep,
                              xd, yd)
    xcep = jax.device_put(np.asarray(xcep))
    ycep = jax.device_put(np.asarray(ycep))
    count = jax.device_put(np.asarray(count))

    mf = jax.jit(jax.vmap(
        lambda a, b, c: chains.mod_filt_corr(a, b, c, 2560.0)))
    timed("mod_filt_corr (batched FFT)", mf, xcep, ycep, count)

    # cep_coef internals
    def cep_nosort(xdb, ydb):
        nsub, nbands = xdb.shape
        cepm = jnp.asarray(chains._cep_basis(nbands, 6), xdb.dtype)
        xlin = 10.0 ** (xdb / 20.0)
        xsum = 20.0 * jnp.log10(jnp.sum(xlin, -1) / nbands)
        valid = xsum > 2.5
        cnt = jnp.maximum(jnp.sum(valid), 1)
        live = (jnp.arange(nsub) < cnt).astype(xdb.dtype)[:, None]
        xcep = (xdb @ cepm) * live
        ycep = (ydb @ cepm) * live
        return xcep, ycep, cnt

    ns = jax.jit(jax.vmap(cep_nosort))
    timed("cep_coef WITHOUT compaction", ns, xd, yd)

    def cep_searchsorted(xdb, ydb):
        nsub, nbands = xdb.shape
        cepm = jnp.asarray(chains._cep_basis(nbands, 6), xdb.dtype)
        xlin = 10.0 ** (xdb / 20.0)
        xsum = 20.0 * jnp.log10(jnp.sum(xlin, -1) / nbands)
        valid = xsum > 2.5
        cnt = jnp.maximum(jnp.sum(valid), 1)
        cs = jnp.cumsum(valid.astype(jnp.int32))
        order = jnp.minimum(
            jnp.searchsorted(cs, jnp.arange(1, nsub + 1)), nsub - 1)
        xv = xdb[order]
        yv = ydb[order]
        live = (jnp.arange(nsub) < cnt).astype(xdb.dtype)[:, None]
        xcep = (xv @ cepm) * live
        ycep = (yv @ cepm) * live
        xcep = (xcep - jnp.sum(xcep, 0) / cnt) * live
        ycep = (ycep - jnp.sum(ycep, 0) / cnt) * live
        return xcep, ycep, cnt

    ss = jax.jit(jax.vmap(cep_searchsorted))
    timed("cep_coef searchsorted compaction", ss, xd, yd)


if __name__ == "__main__":
    main()
