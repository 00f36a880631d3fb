"""Featurization and resynthesis — the L1 frontend, fully on-device.

Equivalents of the reference's `Sp_and_phase_Speech` / `Sp_and_phase_Noise`
(audio_util.py:422-456) and `SP_to_wav`/`Resyn` (audio_util.py:458-461,76-90),
with the Python per-frame loops replaced by the constant-matrix band ops and
the IMCRA scan, so one jit compiles wav -> features and mask -> wav end to end.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nelegan_tpu.config import ImcraConfig
from nelegan_tpu.dsp.stft import stft, istft
from nelegan_tpu.dsp.erb import band_energy, interp_band_gain
from nelegan_tpu.dsp.imcra import imcra_estimate_psd


@functools.partial(jax.jit, static_argnames=("power",))
def featurize_speech(wav: jnp.ndarray, power: float = 1.0 / 6.0):
    """wav [n] -> (band [T, 64] power-compressed, mag [257, T], phase [257, T]).

    Matches reference Sp_and_phase_Speech (audio_util.py:422-437).
    """
    spec = stft(wav)
    mag = jnp.abs(spec)
    phase = jnp.angle(spec)
    band = band_energy(mag.T) ** power
    return band, mag, phase


@functools.partial(jax.jit, static_argnames=("power", "cfg"))
def featurize_noise(wav: jnp.ndarray, power: float = 1.0 / 6.0,
                    cfg: ImcraConfig = ImcraConfig()):
    """wav [n] -> (band [T, 64] of the IMCRA-estimated noise PSD, mag, phase).

    Matches reference Sp_and_phase_Noise (audio_util.py:439-456): the band
    energies are computed on sqrt(PSD) rather than the raw magnitudes.
    """
    spec = stft(wav)
    psd = imcra_estimate_psd(spec, cfg)
    band = band_energy(jnp.sqrt(psd).T) ** power
    mag = jnp.abs(spec)
    phase = jnp.angle(spec)
    return band, mag, phase


@jax.jit
def resynthesize(alpha2: jnp.ndarray, mag: jnp.ndarray,
                 phase: jnp.ndarray) -> jnp.ndarray:
    """Apply per-band energy gains to a complex spectrogram and invert.

    Args:
      alpha2: [T, 64] band energy gains (mask * beta^2).
      mag, phase: [257, T].
    Returns:
      time signal [(T-1)*hop], matching reference SP_to_wav -> Resyn
      (audio_util.py:458-461, 76-90): per-bin gain = sqrt(interp(alpha2))
      with the frequency floors, times mag*e^{j*phase}, then iSTFT.
    """
    gain = jnp.sqrt(interp_band_gain(alpha2))          # [T, 257]
    spec = mag * jnp.exp(1j * phase) * gain.T          # [257, T]
    return istft(spec)


def rms(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    return jnp.sqrt(jnp.mean(x * x, axis=axis))
