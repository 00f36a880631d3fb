"""Stage-level timing of the warm degraded-side HASPI path on the chip.

prof_corpus2.py: the corpus HASPI section is ~160 ms per 8-utt chunk at
bucket 49152 (n24 = 73728) — 85% of warm metric time.  This times each
stage of haspi_v2_from_clean_24k (metrics/haspi/__init__.py:136) as its
own jitted program (pipelined protocol: 5 in-order dispatches, 1 fetch)
to find where the 20 ms/signal goes.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from nelegan_tpu.metrics.haspi import (
    _rms_normalize_one, _single_side_ear, _tail_mask, center_freq, NCHAN,
    haspi_v2_clean_24k, haspi_v2_from_clean_24k, chains)
from nelegan_tpu.metrics.haspi.ear_model import group_delay_comp

B, N24 = 8, 73728
NV = 50400


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
    y = np.zeros((B, N24), np.float32)
    y[:, :NV] = rng.randn(B, NV).astype(np.float32) * 0.1
    nv = np.full((B,), NV, np.int32)
    yd, nvd = jax.device_put((y, nv))
    cfreq = center_freq(NCHAN)

    cl = jax.jit(jax.vmap(lambda a, v: haspi_v2_clean_24k(a, n_valid=v)))(
        yd, nvd)
    cl = jax.tree.map(lambda a: jax.device_put(np.asarray(a)), cl)

    full = jax.jit(jax.vmap(lambda b, v, c: haspi_v2_from_clean_24k(
        b, c, n_valid=v)[0]))
    timed("from_clean FULL", full, yd, nvd, cl)

    norm = jax.jit(jax.vmap(_rms_normalize_one))
    yn = timed("rms_normalize", norm, yd, nvd)
    yn = jax.device_put(np.asarray(yn))

    ear = jax.jit(jax.vmap(lambda a, v: _single_side_ear(a, 65.0, v)))
    ydb, bws = timed("single_side_ear (core)", ear, yn, nvd)
    ydb = jax.device_put(np.asarray(ydb))

    gdc = jax.jit(jax.vmap(lambda e, bw, v: _tail_mask(
        group_delay_comp(e, bw, cfreq), v)))
    ydbc = timed("group_delay_comp+mask", gdc, ydb, cl["bwx"], nvd)
    ydbc = jax.device_put(np.asarray(ydbc))

    ef = jax.jit(jax.vmap(lambda e: chains.env_filt_one(e, 320.0, 2560.0)))
    ylp = timed("env_filt_one (320/2560)", ef, ydbc)
    ylp = jax.device_put(np.asarray(ylp))

    key = jax.random.PRNGKey(0)

    def tail(xlp, ylp_, v):
        _, k = jax.random.split(key)
        xcep, ycep, count = chains.cep_coef(xlp, ylp_, 2.5, 0.1, 6,
                                            key=k, noise_scale=0.0)
        avecm = chains.mod_filt_corr(xcep, ycep, count, 2560.0)
        return avecm

    tl = jax.jit(jax.vmap(tail))
    timed("cep_coef+mod_filt_corr", tl, cl["xlp"], ylp, nvd)

    # inside the ear core: split demod/control/signal via a cut-down core
    from nelegan_tpu.metrics.haspi.ear_model import (
        middle_ear, _carrier, _gammatone_coeffs, loss_parameters)
    from nelegan_tpu.ops.iir import _fft_len_ir, gammatone_ir

    me = jax.jit(jax.vmap(middle_ear))
    mid = timed("middle_ear", me, yn)
    mid = jax.device_put(np.asarray(mid))

    n = N24
    l_gam = min(n, 4096)
    m_gam = _fft_len_ir(n, l_gam)
    _, bw1, _, _, _ = loss_parameters(jnp.full(6, 100.0), cfreq)
    bw1 = jax.device_put(np.asarray(bw1))

    def demod(midb):
        def one(cf):
            cosc, sinc = _carrier(n, cf, jnp.float32)
            return (jnp.fft.rfft(midb * cosc, m_gam),
                    jnp.fft.rfft(midb * sinc, m_gam))
        return jax.vmap(one)(jnp.asarray(cfreq, jnp.float32))

    dm = jax.jit(jax.vmap(demod))
    return
    xc, xs = timed("demod 32ch (2 rfft @98304)", dm, mid)
    xc = jax.device_put(np.asarray(xc))
    xs = jax.device_put(np.asarray(xs))

    def ctl_filter(xc_f, xs_f, bw1_v):
        def one(xcf, xsf, bwn, cf):
            a, _, _, gain = _gammatone_coeffs(bwn, cf, jnp.float32)
            h_f = jnp.fft.rfft(gammatone_ir(a, l_gam, jnp.float32), m_gam)
            ur = jnp.fft.irfft(xcf * h_f, m_gam)[..., :n]
            ui = jnp.fft.irfft(xsf * h_f, m_gam)[..., :n]
            return gain * jnp.sqrt(ur * ur + ui * ui + 1e-20)
        return jax.vmap(one)(xc_f, xs_f, bw1_v,
                             jnp.asarray(cfreq, jnp.float32))

    cf_ = jax.jit(jax.vmap(lambda a, b: ctl_filter(a, b, bw1)))
    timed("control gfilter (2 irfft + env)", cf_, xc, xs)


if __name__ == "__main__":
    main()
