"""ERB band analysis / synthesis as constant matrices (MXU matmuls).

The reference computes 64 triangular-interpolated band energies from 257
rFFT magnitude bins with a per-frame Python triple loop
(reference: audio_util.py:30-50 `compute_band_E`), and expands 64 band gains
back to 257 bins with another loop (reference: audio_util.py:93-110
`interp_band_gain`).  The reference itself notes the matrix formulation
("This can be optimized by using a in-advance prepared 257X64 matrix",
audio_util.py:29) — here both directions *are* those matrices, so band
pooling and gain expansion each become one matmul that XLA places on the MXU
and fuses with neighbouring elementwise work.

Semantics preserved exactly:
  * analysis: ``bandE[i] += (1-frac) * |X[k]|^2``, ``bandE[i+1] += frac * |X[k]|^2``
    with ``frac = j / band_size`` for the j-th bin of band i;
  * synthesis: ``g[k] = (1-frac) * bandE[i] + frac * bandE[i+1]`` followed by
    the hard floors ``g[0] = g[1] = 1e-4``, ``g[256] = 1e-2``.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from nelegan_tpu.config import GMTBAND


@functools.lru_cache(maxsize=None)
def band_analysis_matrix(n_bins: int = 257, n_bands: int = 64) -> np.ndarray:
    """[n_bins, n_bands] matrix A with bandE = (mag**2) @ A."""
    edges = GMTBAND
    a = np.zeros((n_bins, n_bands), dtype=np.float64)
    for i in range(n_bands - 1):
        size = edges[i + 1] - edges[i]
        for j in range(size):
            frac = j / size
            k = edges[i] + j
            a[k, i] += 1.0 - frac
            a[k, i + 1] += frac
    return a


@functools.lru_cache(maxsize=None)
def band_synthesis_matrix(n_bins: int = 257, n_bands: int = 64) -> np.ndarray:
    """[n_bands, n_bins] matrix B with g = bandE @ B (before floors)."""
    edges = GMTBAND
    b = np.zeros((n_bands, n_bins), dtype=np.float64)
    for i in range(n_bands - 1):
        size = edges[i + 1] - edges[i]
        for j in range(size):
            frac = j / size
            k = edges[i] + j
            b[i, k] = 1.0 - frac
            b[i + 1, k] = frac
    return b


def band_energy(mag: jnp.ndarray) -> jnp.ndarray:
    """Band energies of a magnitude spectrogram.

    Args:
      mag: ``[..., T, n_bins]`` magnitude (or sqrt-PSD) frames.
    Returns:
      ``[..., T, n_bands]`` band energies (sum of triangular-weighted bin
      powers), matching reference `compute_band_E` (audio_util.py:30).
    """
    a = jnp.asarray(band_analysis_matrix(mag.shape[-1]), dtype=mag.dtype)
    return (mag * mag) @ a


def interp_band_gain(band_e: jnp.ndarray, floor_low: float = 1e-4,
                     floor_high: float = 1e-2) -> jnp.ndarray:
    """Expand per-band energy gains to per-bin gains.

    Args:
      band_e: ``[..., T, n_bands]`` band gains (alpha^2).
    Returns:
      ``[..., T, n_bins]`` bin gains with the low/high frequency floors
      applied, matching reference `interp_band_gain` (audio_util.py:93-110).
    """
    b = jnp.asarray(band_synthesis_matrix(n_bands=band_e.shape[-1]),
                    dtype=band_e.dtype)
    g = band_e @ b
    g = g.at[..., 0].set(floor_low)
    g = g.at[..., 1].set(floor_low)
    g = g.at[..., -1].set(floor_high)
    return g
