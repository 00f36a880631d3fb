"""STFT / iSTFT with librosa-compatible semantics, expressed TPU-first.

The reference calls `librosa.stft(x, n_fft=512, hop_length=256, win_length=512)`
and `librosa.istft(X, hop_length=256, win_length=512)`
(reference: audio_util.py:53-65).  librosa semantics are:

  * centered frames: the signal is padded with ``n_fft // 2`` samples of
    reflection on both ends,
  * a *periodic* Hann window (``scipy.signal.get_window('hann', n, fftbins=True)``),
  * ``rfft`` per frame -> ``[n_fft//2 + 1, T]`` complex,
  * iSTFT: per-frame ``irfft`` * window, overlap-add, normalized by the
    overlap-added squared window (floored at a tiny value), then the
    ``n_fft // 2`` center padding is trimmed from both ends.

TPU notes: framing is a static gather, the DFT runs through XLA's FFT, and the
overlap-add is a scatter-add with statically-known (sorted) indices, all of
which fuse cleanly under jit.  Everything is static-shape: the frame count is
a function of the (static) signal length.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_periodic(n: int, dtype=np.float64) -> np.ndarray:
    """Periodic (DFT-even) Hann window, equal to
    ``scipy.signal.get_window('hann', n, fftbins=True)``."""
    k = np.arange(n, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)
    return w.astype(dtype)


def ola_norm_half_overlap(n_fft: int = 512) -> np.ndarray:
    """Interior squared-window OLA normalisation profile [n_fft//2] for
    hop = n_fft/2: every emitted block sees w^2[n] + w^2[n + hop].  Shared
    by the offline OLA (pipeline.istft_batch_tail_truncated) and the
    streaming enhancer so their bit-exact parity has one source of truth."""
    w2 = np.asarray(hann_periodic(n_fft)) ** 2
    return w2[:n_fft // 2] + w2[n_fft // 2:]


def num_frames(n_samples: int, n_fft: int = 512, hop: int = 256,
               center: bool = True) -> int:
    padded = n_samples + (n_fft if center else 0)
    return 1 + (padded - n_fft) // hop


@functools.lru_cache(maxsize=None)
def _reflect_indices(n: int, pad: int) -> np.ndarray:
    """Gather indices for numpy-style reflect padding of a length-n axis.
    Unlike jnp.pad(mode='reflect'), numpy/librosa allow pad >= n via
    repeated reflection; shapes are static so the index table is free."""
    idx = np.arange(-pad, n + pad)
    period = max(2 * (n - 1), 1)
    idx = np.abs(idx) % period
    return np.where(idx >= n, period - idx, idx)


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int,
                 center: bool = True) -> jnp.ndarray:
    """Slice ``x [..., n]`` into overlapping frames ``[..., T, n_fft]``.

    With ``center=True`` the signal is reflect-padded by ``n_fft//2`` on
    both sides first (numpy-style repeated reflection, so signals shorter
    than the pad work exactly like librosa's np.pad).
    """
    if center:
        pad = n_fft // 2
        x = x[..., _reflect_indices(x.shape[-1], pad)]
    n = x.shape[-1]
    t = 1 + (n - n_fft) // hop
    # Static gather: index matrix [T, n_fft].
    idx = (np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :])
    return x[..., idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_length", "center"))
def stft(x: jnp.ndarray, n_fft: int = 512, hop: int = 256,
         win_length: int = 512, center: bool = True) -> jnp.ndarray:
    """librosa-compatible STFT.

    Args:
      x: real signal ``[..., n]``.
    Returns:
      complex spectrogram ``[..., n_fft//2+1, T]`` (bins-first, matching the
      reference's layout).
    """
    if win_length != n_fft:
        # librosa centers the window inside the frame; the reference always
        # uses win_length == n_fft so we only support the padded-center case.
        w = hann_periodic(win_length)
        lpad = (n_fft - win_length) // 2
        window = np.zeros(n_fft)
        window[lpad:lpad + win_length] = w
    else:
        window = hann_periodic(n_fft)
    frames = frame_signal(x, n_fft, hop, center)          # [..., T, n_fft]
    frames = frames * jnp.asarray(window, dtype=frames.dtype)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)         # [..., T, n_bins]
    return jnp.swapaxes(spec, -1, -2)                     # [..., n_bins, T]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "win_length",
                                             "center", "length"))
def istft(spec: jnp.ndarray, n_fft: int = 512, hop: int = 256,
          win_length: int = 512, center: bool = True,
          length: int | None = None) -> jnp.ndarray:
    """librosa-compatible inverse STFT.

    Args:
      spec: complex ``[..., n_bins, T]``.
    Returns:
      real signal ``[..., out_len]`` where ``out_len = (T-1)*hop`` for the
      centered case (librosa default), or ``length`` if given.
    """
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    # synthesis window mirrors the analysis window, including the librosa
    # zero-padded-center case for win_length < n_fft
    if win_length != n_fft:
        w = hann_periodic(win_length)
        lpad = (n_fft - win_length) // 2
        win_np = np.zeros(n_fft)
        win_np[lpad:lpad + win_length] = w
    else:
        win_np = hann_periodic(n_fft)
    # match the window dtype to the frames: a float64 numpy window would
    # silently promote f32 audio to f64 under x64
    window = jnp.asarray(win_np, dtype=frames.dtype)
    frames = frames * window                               # [..., T, n_fft]
    t = frames.shape[-2]
    full = n_fft + hop * (t - 1)

    # Overlap-add via scatter-add with static indices.
    idx = (np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]).reshape(-1)
    flat = frames.reshape(frames.shape[:-2] + (t * n_fft,))
    y = jnp.zeros(frames.shape[:-2] + (full,), dtype=frames.dtype)
    y = y.at[..., idx].add(flat)

    # Squared-window normalization (librosa window_sumsquare), computed
    # statically in numpy since it depends only on shapes.
    wsq = np.zeros(full)
    w2 = np.asarray(win_np) ** 2
    for i in range(t):
        wsq[i * hop:i * hop + n_fft] += w2
    tiny = np.finfo(np.float32).tiny
    wsq = np.where(wsq > tiny, wsq, 1.0)  # librosa leaves ~zero-sum samples as-is
    y = y / jnp.asarray(wsq, dtype=y.dtype)

    if center:
        y = y[..., n_fft // 2: full - n_fft // 2]
    if length is not None:
        out = y.shape[-1]
        if out >= length:
            y = y[..., :length]
        else:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - out)])
    return y
