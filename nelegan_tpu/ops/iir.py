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


def one_pole_blocked(x: jnp.ndarray, a, block: int = 128) -> jnp.ndarray:
    """y[n] = x[n] + a*y[n-1] along the last axis, MXU formulation.

    The recurrence splits into `block`-sized chunks: within a chunk the
    solution is a lower-triangular matmul with T[i, j] = a^(i-j) (a dense
    [block, block] matrix the MXU eats directly), and the chunk boundary
    carries compose as a tiny scalar scan of length T/block:

        z_b   = T @ x_b                      (batched matmul, MXU)
        c_b   = z_b[-1] + a^block * c_{b-1}  (scalar scan)
        y_b   = z_b + a^(i+1) * c_{b-1}      (elementwise)

    ~block x more MACs than the O(T log T) associative scan but they run on
    the systolic array instead of shuffle-heavy VPU passes — the faster
    choice for the 24 kHz auditory-model filters on TPU.  `a` is a scalar
    (per-channel values arrive via vmap).
    """
    a = jnp.asarray(a, x.dtype)
    n = x.shape[-1]
    nb = -(-n // block)
    pad = nb * block - n
    xb = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    lead = xb.shape[:-1]
    xb = xb.reshape(lead + (nb, block))

    i = jnp.arange(block)
    powers = a ** i                                    # a^0 .. a^(block-1)
    tri = jnp.where(i[:, None] >= i[None, :],
                    a ** (i[:, None] - i[None, :]).astype(x.dtype), 0.0)
    z = jnp.einsum("ij,...bj->...bi", tri, xb,
                   preferred_element_type=x.dtype)

    # carries: c_b = z_b[-1] + a^block * c_{b-1}
    a_blk = a ** block

    def combine(lhs, rhs):
        ga, fa = lhs
        gb, fb = rhs
        return ga * gb, fb + gb * fa

    gains = jnp.broadcast_to(a_blk, z.shape[:-1])
    _, carries = jax.lax.associative_scan(combine, (gains, z[..., -1]),
                                          axis=-1)
    prev_carry = jnp.concatenate(
        [jnp.zeros_like(carries[..., :1]), carries[..., :-1]], axis=-1)
    y = z + (a * powers) * prev_carry[..., None]
    return y.reshape(lead + (nb * block,))[..., :n]


def one_pole_cascade(x: jnp.ndarray, a, order: int, axis: int = -1,
                     blocked: bool | None = None):
    """`order` identical one-pole stages in cascade.

    blocked=None auto-selects the MXU formulation for long real-typed
    signals on the last axis.
    """
    if blocked is None:
        # the blocked Toeplitz form assumes a scalar pole (its [128, 128]
        # power matrix would silently mix per-channel poles); broadcastable
        # `a` stays on the associative-scan path
        blocked = (axis in (-1, x.ndim - 1) and x.shape[-1] >= 4096
                   and not jnp.iscomplexobj(x) and jnp.ndim(a) == 0)
    y = x
    for _ in range(order):
        y = one_pole_blocked(y, a) if blocked else one_pole(y, a, axis=axis)
    return y


# ---------------------------------------------------------------------------
# Exact IIR filtering by FFT convolution with closed-form impulse responses.
#
# Every filter in the auditory model is LTI with a *closed-form* impulse
# response (one-poles: a^k; the 4th-order gammatone: C(k+3,3) a^k convolved
# with its 3-tap numerator; the IHC circuit: a sum of two real exponentials).
# Filtering a length-n signal is then ONE exact linear convolution — two
# large rFFTs and an elementwise product — instead of hundreds of dependent
# scan steps.  On TPU this is the speed-of-light formulation: the XLA FFT is
# dense parallel work, and all 32 ear channels batch into a single FFT call.
# ---------------------------------------------------------------------------

def _fft_len(n: int) -> int:
    """Smallest 2^k or 3*2^k >= 2n (XLA's TPU FFT handles the radix-3 factor
    efficiently; measured ~33% faster than rounding up to the next 2^k)."""
    return _fft_len_ir(n, n)


def _fft_len_ir(n: int, ir_len: int) -> int:
    """Smallest 2^k or 3*2^k >= n + ir_len: the exact linear-convolution
    FFT size for a length-n signal against a length-ir_len kernel.  The
    auditory model's impulse responses decay exponentially, so truncating
    them at the f32 noise floor (caller picks ir_len from the slowest
    pole) typically halves the FFT size vs the full 2n rule.

    Size granularity, measured on v5e: an ISOLATED rfft/irfft pair is
    ~linear in size even at 4096-multiples (4096*19 beats 3*2^k by 25%),
    but inside the fused ear-model program finer 4096-grid sizes LOSE
    ~15% end-to-end (XLA fusion/layout effects dominate the FFT savings),
    so the coarse 2^k / 3*2^k grid stays.  Mixed PER-STAGE sizes on that
    coarse grid, however, WIN (r2 re-measurement after the group-delay
    gather fix: ear core 15.9 -> 7.8 ms/signal) — see
    metrics/haspi/ear_model.py."""
    need = n + ir_len
    m = 1
    while m < need:
        m *= 2
    m3 = 3 * (m // 4)
    return m3 if m3 >= need else m


def fft_causal_conv(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Exact y[n] = sum_k h[k] x[n-k] for full-length h (h.shape[-1] ==
    x.shape[-1]); broadcasting batch dims."""
    n = x.shape[-1]
    m = _fft_len(n)
    y = jnp.fft.irfft(jnp.fft.rfft(x, m) * jnp.fft.rfft(h, m), m)
    return y[..., :n].astype(x.dtype)


def one_pole_ir(a, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """h[k] = a^k, computed as exp(k log |a|) (underflows cleanly), with
    sign alternation for negative poles."""
    a = jnp.asarray(a, dtype)
    k = jnp.arange(n, dtype=dtype)
    mag = jnp.exp(k * jnp.log(jnp.maximum(jnp.abs(a), 1e-30)))
    sign = jnp.where(a < 0, 1.0 - 2.0 * (jnp.arange(n) % 2), 1.0)
    return (mag * sign).astype(dtype)


def gammatone_ir(a, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """Impulse response of the reference gammatone section
    [1, 4a, 4a^2] / (1 - a z^-1)^4 (pyhaspi2.py:871-877):

        d[k] = C(k+3, 3) a^k            (4-pole part)
        h[k] = d[k] + 4a d[k-1] + 4a^2 d[k-2]

    evaluated in the log domain so a^k underflows without killing the
    polynomial prefactor's precision."""
    a = jnp.asarray(a, dtype)
    k = jnp.arange(n, dtype=dtype)
    log_a = jnp.log(jnp.maximum(a, 1e-30))
    log_poly = (jnp.log1p(k) + jnp.log(k + 2.0) + jnp.log(k + 3.0)
                - jnp.log(6.0))
    d = jnp.exp(k * log_a + log_poly)
    d1 = jnp.concatenate([jnp.zeros_like(d[..., :1]), d[..., :-1]], -1)
    d2 = jnp.concatenate([jnp.zeros_like(d[..., :2]), d[..., :-2]], -1)
    return (d + 4.0 * a * d1 + 4.0 * (a * a) * d2).astype(dtype)


def exp_sum_ir(lams, weights, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """h[k] = sum_i weights[i] * lams[i]^k (real exponential mixtures, e.g.
    the IHC adaptation circuit's 2-state response).  Poles must be real
    (complex pairs should be pre-combined by the caller)."""
    import numpy as np
    k = jnp.arange(n, dtype=dtype)
    h = jnp.zeros(n, dtype)
    for lam, w in zip(lams, weights):
        lam = float(np.real_if_close(lam))
        # clamp like one_pole_ir: log(0) = -inf would make h[0] = 0 * -inf
        # = NaN for a zero pole instead of the correct [w, 0, 0, ...]
        mag = jnp.asarray(max(abs(lam), 1e-30), dtype)
        h = h + w * jnp.exp(k * jnp.log(mag)) * (
            1.0 if lam >= 0 else (1.0 - 2.0 * (jnp.arange(n) % 2)))
    return h


def one_pole_fft(x: jnp.ndarray, a) -> jnp.ndarray:
    return fft_causal_conv(x, one_pole_ir(a, x.shape[-1], x.dtype))


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
