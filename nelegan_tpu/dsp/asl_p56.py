"""ITU-T P.56 method-B active speech level, as a lax.scan.

Equivalent of the reference's `asl_P56` (reference: asl_P56.py:23-94): a
2x one-pole IIR envelope detector, 15 activity counters with hangover, and a
bisection interpolation to the active-level/threshold crossing.  The
per-sample double loop becomes a scan carrying the 15-vector counter state;
the bisection is a bounded while_loop, so the whole thing jits.

Note the reference iterates thresholds with an early `break`; since the
thresholds are increasing and hangover counters are ordered, the break never
changes the counters (it only skips no-op updates), so the vectorised update
is exact — verified against the reference golden.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("fs", "nbits"))
def asl_p56(x: jnp.ndarray, fs: int = 16000, nbits: int = 16):
    """Returns (asl_msq, actfact, c0) like the reference asl_P56."""
    eps = jnp.asarray(2.220446049250313e-16, x.dtype)
    t_const = 0.03
    hang_s = 0.2
    margin = 15.9
    thres_no = nbits - 1

    hang_max = int(-(-fs * hang_s // 1))  # ceil(fs * H), static
    g = jnp.exp(-1.0 / (fs * t_const)).astype(x.dtype)
    c = (2.0 ** jnp.arange(-15, thres_no - 15)).astype(x.dtype)

    sq = jnp.sum(x * x)
    n = x.shape[0]

    # envelope: q = smooth(smooth(|x|)), one-pole IIR applied twice
    # y[k] = (1-g)*u[k] + g*y[k-1]  ->  linear first-order recurrence
    def iir(u):
        def combine(a, b):
            ga, fa = a
            gb, fb = b
            return ga * gb, fb + gb * fa
        gains = jnp.full_like(u, g)
        _, y = jax.lax.associative_scan(combine, (gains, (1 - g) * u))
        return y

    q = iir(iir(jnp.abs(x)))

    # Counter semantics, closed form: a sample is counted for threshold j iff
    # the envelope crosses c[j] there, or the last crossing was at most
    # hang_max samples ago (the hangover counter equals the gap, saturated).
    # The reference initialises hang = I, so leading silence never counts.
    idx = jnp.arange(n, dtype=jnp.int32)
    active = q[:, None] >= c[None, :]                      # [n, thres_no]
    neg_inf = jnp.asarray(-(n + int(hang_max) + 2), jnp.int32)
    last = jax.lax.cummax(
        jnp.where(active, idx[:, None], neg_inf), axis=0)  # last crossing
    counted = active | ((idx[:, None] - last) <= hang_max)
    a = jnp.sum(counted, axis=0).astype(jnp.int32) - 1     # reference a init=-1

    no_activity = a[0] == -1
    a = a + 2
    adb = 10.0 * jnp.log10(sq / (a.astype(x.dtype) + eps) + eps)
    cdb = 20.0 * jnp.log10(c + eps)
    delta = adb - cdb

    # first j >= 1 with a[j] != 0 and Delta[j] <= margin.  The a != 0 term
    # is provably always true here — and in the reference too (asl_P56.py:
    # a starts at -1, only increments, then a += 2, so min(a) == 1); it is
    # kept verbatim for line-by-line parity with the reference's dead check.
    elig = (jnp.arange(thres_no) >= 1) & (a != 0) & (delta <= margin)
    j = jnp.argmax(elig)
    found = jnp.any(elig) & ~no_activity & (delta[0] >= margin)

    def bisect(upcount, lwcount, upthr, lwthr):
        def cond(s):
            midc, midt, tol, it, done = s
            return (~done) & (jnp.abs(midc - midt - margin) > tol)

        def body(s):
            midc, midt, tol, it, done = s
            diff = midc - midt - margin
            tol = jnp.where(it > 20, tol * 1.1, tol)
            hi = diff > tol
            midc = jnp.where(hi, (upcount + midc) / 2, (midc + lwcount) / 2)
            midt = jnp.where(hi, (upthr + midt) / 2, (midt + lwthr) / 2)
            return midc, midt, tol, it + 1, done

        # reference early-outs if an endpoint already satisfies the margin
        e_up = jnp.abs(upcount - upthr - margin) < 0.5
        e_lw = jnp.abs(lwcount - lwthr - margin) < 0.5
        init = ((upcount + lwcount) / 2, (upthr + lwthr) / 2,
                jnp.asarray(0.5, x.dtype), jnp.asarray(1, jnp.int32),
                e_up | e_lw)
        midc, midt, _, _, _ = jax.lax.while_loop(cond, body, init)
        midc = jnp.where(e_up, upcount, jnp.where(e_lw, lwcount, midc))
        midt = jnp.where(e_up, upthr, jnp.where(e_lw, lwthr, midt))
        return midc, midt

    asl_log, cl0 = bisect(adb[j], adb[j - 1], cdb[j], cdb[j - 1])
    asl_msq = jnp.where(found, 10.0 ** (asl_log / 10.0), 0.0)
    actfact = jnp.where(found, (sq / n) / jnp.maximum(asl_msq, eps), 0.0)
    c0 = jnp.where(found, 10.0 ** (cl0 / 20.0), 0.0)
    return asl_msq, actfact, c0
