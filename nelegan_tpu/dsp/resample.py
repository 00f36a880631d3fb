"""Polyphase resampling as one dilated/strided convolution.

The reference resamples 16 kHz -> 24 kHz inside the HASPI ear model with
`librosa.resample` (reference: pyHASPI/pyhaspi2.py:810-821).  Here the
rational-rate resampler is a single `lax.conv_general_dilated` whose
`lhs_dilation` implements the zero-stuffing upsample and whose stride
implements the decimation — one fused op instead of a host round-trip.
The FIR prototype matches scipy.signal.resample_poly's default design
(Kaiser beta=5.0, 10*max(up,down) taps per side), which is the test oracle.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _design_filter(up: int, down: int) -> np.ndarray:
    import scipy.signal
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    h = scipy.signal.firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0))
    return (h * up).astype(np.float64)


@functools.partial(jax.jit, static_argnames=("up", "down"))
def resample_poly(x: jnp.ndarray, up: int, down: int) -> jnp.ndarray:
    """Rational resample of ``x [..., n]`` by up/down (scipy-compatible)."""
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == down == 1:
        return x
    h = _design_filter(up, down)
    n_in = x.shape[-1]
    n_out = -(-n_in * up // down)  # ceil

    # scipy.resample_poly alignment: the filter is zero-padded so that the
    # upfirdn output starts at the filter's center tap.
    half = (len(h) - 1) // 2
    # output sample m comes from full-conv index m*down + half of the
    # zero-stuffed input convolved with h.
    lead = x.ndim - 1
    lhs = x.reshape((-1, 1, n_in)).astype(jnp.result_type(x.dtype, jnp.float32))
    rhs = jnp.asarray(h[::-1].copy(), dtype=lhs.dtype).reshape((1, 1, -1))
    # conv_general_dilated computes correlation with rhs; reversing h makes it
    # a convolution.  lhs_dilation=up zero-stuffs; padding aligns center tap.
    pad_lo = half
    pad_hi = half + (n_out - 1) * down - (n_in - 1) * up
    pad_hi = max(pad_hi, 0) + len(h)  # generous tail; we slice to n_out below
    y = jax.lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(down,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    y = y[..., 0, :n_out]
    return y.reshape(x.shape[:lead] + (n_out,)).astype(x.dtype)


def resample_16k_to_24k(x: jnp.ndarray) -> jnp.ndarray:
    return resample_poly(x, 3, 2)
