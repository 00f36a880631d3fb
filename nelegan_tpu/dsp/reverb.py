"""Reverberation utilities for the reverb-condition evaluation.

Equivalents of the reference eval_metrics.py helpers: RIR convolution via
`scipy.signal.lfilter(rir, 1, x)` becomes an FFT convolution (reference:
eval_metrics.py:131-136), the direct-path RIR truncation keeps
argmax + 32 taps (eval_metrics.py:127-130), and `clip` is the reference's
iterative overflow guard (audio_util.py:67-74).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def fir_filter(h: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """lfilter(h, [1], x): causal FIR, output length == len(x)."""
    n = x.shape[-1]
    m = h.shape[-1]
    full = jnp.fft.irfft(
        jnp.fft.rfft(x, n + m) * jnp.fft.rfft(h, n + m), n + m)
    return full[..., :n].astype(x.dtype)


def direct_path_rir(rir: np.ndarray, tau: int = 32) -> np.ndarray:
    """Truncate an RIR to its direct path: argmax + tau taps, zero tail."""
    b = int(np.argmax(rir))
    out = np.zeros_like(rir)
    out[: b + tau] = rir[: b + tau]
    return out


def clip_overflow(x: np.ndarray) -> np.ndarray:
    """Reference `clip` (audio_util.py:67-74): shrink by growing factors
    until the signal fits in [-1, 1)."""
    small = 0.05
    while np.max(x) >= 1 or np.min(x) < -1:
        x = x / (1.0 + small)
        small += 0.05
    return x
