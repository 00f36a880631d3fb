"""IIR filters as log-depth associative scans (the TPU answer to lfilter).

The reference's hot loops are all sequential IIR recurrences executed either
by scipy.lfilter or by numba per-sample loops (reference: pyhaspi2.py:897-914
gammatone cascades, :833-841 middle ear, :993-995 compression smoother,
:1028-1078 IHC adaptation, noise_est/ns.py).  A first-order linear recurrence

    y[n] = a[n] * y[n-1] + b[n]

has an associative composition law  (a2, b2) ∘ (a1, b1) = (a1*a2, b2 + a2*b1),
so `jax.lax.associative_scan` evaluates it in O(log T) depth with full VPU
parallelism — orders of magnitude faster on TPU than a sequential scan for
the 24 kHz, multi-second signals the auditory metrics process.

Higher orders decompose structurally:
  * the 4th-order gammatone denominator is (1 - a z^-1)^4 -> 4 cascaded
    one-poles (pyhaspi2.py:871-877 defines exactly those coefficients);
  * real 2nd-order sections run as a 2x2 matrix recurrence;
  * the IHC adaptation circuit is a constant 2-state linear system -> its
    eigendecomposition turns it into two independent (complex) one-poles
    (see metrics/haspi/ear_model.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def one_pole(x: jnp.ndarray, a, axis: int = -1) -> jnp.ndarray:
    """y[n] = x[n] + a*y[n-1] along `axis`; `a` scalar or broadcastable."""
    a_full = jnp.broadcast_to(jnp.asarray(a, x.dtype), x.shape)

    def combine(lhs, rhs):
        ga, fa = lhs
        gb, fb = rhs
        return ga * gb, fb + gb * fa

    _, y = jax.lax.associative_scan(combine, (a_full, x), axis=axis)
    return y


def one_pole_cascade(x: jnp.ndarray, a, order: int, axis: int = -1):
    """`order` identical one-pole stages in cascade."""
    y = x
    for _ in range(order):
        y = one_pole(y, a, axis=axis)
    return y


def fir(x: jnp.ndarray, taps, axis: int = -1) -> jnp.ndarray:
    """y[n] = sum_k taps[k] * x[n-k] (causal, zero initial state)."""
    taps = jnp.asarray(taps, x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    y = taps[0] * x
    shifted = x
    for k in range(1, taps.shape[0]):
        shifted = jnp.concatenate(
            [jnp.zeros_like(shifted[..., :1]), shifted[..., :-1]], axis=-1)
        y = y + taps[k] * shifted
    return jnp.moveaxis(y, -1, axis)


def linear_recurrence_2x2(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """s[n] = m[n] @ s[n-1] + v[n] with s in R^2.

    Args:
      m: [T, 2, 2] (or constant broadcast), v: [T, 2].
    Returns:
      s: [T, 2].
    """
    m = jnp.broadcast_to(m, v.shape[:-1] + (2, 2))

    def combine(lhs, rhs):
        ma, va = lhs
        mb, vb = rhs
        return (jnp.einsum("...ij,...jk->...ik", mb, ma),
                vb + jnp.einsum("...ij,...j->...i", mb, va))

    _, s = jax.lax.associative_scan(combine, (m, v), axis=0)
    return s


def biquad(x: jnp.ndarray, b, a, axis: int = -1) -> jnp.ndarray:
    """2nd-order IIR y = lfilter(b, a, x), a = [1, a1, a2], b = [b0, b1, b2].

    Runs the denominator as a complex pole-pair cascade when the poles are
    complex (the usual case), else as two real one-poles.
    """
    b = jnp.asarray(b, dtype=jnp.float64 if x.dtype == jnp.float64
                    else jnp.float32)
    import numpy as np
    a_np = np.asarray(a, np.float64)
    roots = np.roots(a_np)  # poles (static coefficients)
    t = fir(x, jnp.concatenate([b, jnp.zeros((3 - b.shape[0],), b.dtype)])
            if b.shape[0] < 3 else b, axis=axis)
    if np.iscomplexobj(roots) and abs(roots[0].imag) > 1e-12:
        p = complex(roots[0])
        cdt = jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64
        y = one_pole(t.astype(cdt), jnp.asarray(p, cdt), axis=axis)
        y = one_pole(y, jnp.asarray(np.conj(p), cdt), axis=axis)
        return jnp.real(y).astype(x.dtype)
    y = one_pole(t, float(roots[0].real), axis=axis)
    return one_pole(y, float(roots[1].real), axis=axis)
