"""SIIB^Gauss — speech intelligibility in bits (Gaussian capacity variant).

The reference scores SIIB through the pysiib package
(reference: intel.py:4,57-100 `SIIB(x, y, fs, gauss=True)`), which wraps the
MATLAB reference of Van Kuyk, Kleijn & Hendriks.  That package is not
vendorable here; this module re-derives the metric from the publications:

  [1] S. Van Kuyk, W. B. Kleijn, R. C. Hendriks, "An instrumental
      intelligibility metric based on information theory", IEEE SPL 2018.
  [2] S. Van Kuyk et al., "An evaluation of intrusive instrumental
      intelligibility metrics", IEEE/ACM TASLP 2018 (SIIB^Gauss).

Pipeline: silence removal (40 dB) -> 400/200 Hann STFT -> 40-channel
ERB-spaced gammatone log-energies -> per-band mean removal -> stacking of
K=15 consecutive frames -> KLT (eigenvectors of the clean covariance) ->
per-dimension correlation rho_j -> Gaussian channel capacity with speech
production noise rho_p^2 = 0.75:

    I = -0.5 * sum_j log2(1 - rho_p^2 * rho_j^2)   [bits / stacked vector]
    SIIB = I * frame_rate / K                      [bits / s]

Scores are used through the logistic calibration (a=-0.06, b=32,
reference intel.py:102-106), which tolerates an affine re-derivation; the
calibration constants live in config.MetricCalibration and can be refit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nelegan_tpu.dsp.resample import resample_poly

FS = 16000
WIN = 400
HOP = 200
NFFT = 512
J_BANDS = 40
K_STACK = 15
RHO_P2 = 0.75
DYN_RANGE = 40.0
_EPS = np.finfo(np.float64).eps


def _erb_space(flow: float, fhigh: float, n: int) -> np.ndarray:
    ear_q, min_bw = 9.26449, 24.7
    lo = np.log(flow + ear_q * min_bw)
    hi = np.log(fhigh + ear_q * min_bw)
    return np.exp(np.linspace(lo, hi, n)) - ear_q * min_bw


@functools.lru_cache(maxsize=None)
def _gammatone_matrix() -> np.ndarray:
    """[J, 257] squared-magnitude 4th-order gammatone responses, ERB-spaced
    100 Hz .. 6500 Hz, row-normalised."""
    f = np.linspace(0, FS / 2, NFFT // 2 + 1)
    cf = _erb_space(100.0, 6500.0, J_BANDS)
    erb = 24.7 + cf / 9.26449
    g = np.zeros((J_BANDS, len(f)))
    for j in range(J_BANDS):
        # 4th-order gammatone magnitude response
        g[j] = (1.0 + ((f - cf[j]) / (1.019 * erb[j])) ** 2) ** -4
    g /= g.sum(axis=1, keepdims=True)
    return g


from nelegan_tpu.metrics._framing import frame_exclusive as _frame


def _stack_pair(x: jnp.ndarray, y: jnp.ndarray | None,
                n_valid: jnp.ndarray | None):
    """Shared SIIB frontend: framing, clean-driven silence removal,
    gammatone log-energies, mean removal, K-frame stacking.

    Returns (vx, vy, scnt): zero-mean stacked vectors [S, K*J] for both
    signals plus the live-vector count.  With y=None only the clean side
    is computed (vy is None) — the KLT-precompute path."""
    dt = x.dtype
    w = jnp.asarray(np.hanning(WIN + 2)[1:-1], dt)
    xf = _frame(x, WIN, HOP) * w
    nf = xf.shape[0]

    # silence removal on clean-signal energy, compacted to the front.
    # Tried and rejected (r2, measured on v5e): (a) moving this compaction
    # gather after the band reduction (gathering [F,40] rows instead of
    # [F,400] frames) and (b) replacing the K-stack gather below with
    # K_STACK static slices + concat (the ear model's roll trick).  Both
    # exact; neither moved the needle — warm with-KLT path 14.6 -> 14.8 ms
    # single / 3.90 -> 3.69 ms/score vmapped B=4 at bucket 470528 (noise),
    # because the rfft dominates and XLA lowers these gathers as cheap
    # dynamic-slices already.  The real score_for_d cost is host-side
    # tiling/prep, not this program.
    energy = 20.0 * jnp.log10(jnp.linalg.norm(xf, axis=-1) + _EPS)
    if n_valid is not None:
        starts = jnp.arange(nf) * HOP
        energy = jnp.where(starts < (n_valid - WIN), energy, -jnp.inf)
    keep = energy > (jnp.max(energy) - DYN_RANGE)
    kcount = jnp.sum(keep)
    order = jnp.argsort(~keep, stable=True)
    live = (jnp.arange(nf) < kcount)
    xk = xf[order] * live[:, None]
    if y is None:
        xy = xk[None]                                       # [1, F, WIN]
    else:
        yf = _frame(y, WIN, HOP) * w
        yk = yf[order] * live[:, None]
        # both signals as one [2, ...]-batched stack (halves op count)
        xy = jnp.stack([xk, yk])                            # [2, F, WIN]

    g = jnp.asarray(_gammatone_matrix(), dt)
    p2 = jnp.abs(jnp.fft.rfft(xy, NFFT, axis=-1)) ** 2      # [S, F, 257]
    e2 = jnp.log(p2 @ g.T + _EPS)                           # [S, F, J]

    livef = live.astype(dt)[None, :, None]
    cnt = jnp.maximum(kcount, 1).astype(dt)
    e2 = (e2 - jnp.sum(e2 * livef, 1, keepdims=True) / cnt) * livef

    # stack K consecutive frames (shift 1) -> [S, S', K*J]
    s = nf - K_STACK + 1
    idx = np.arange(s)[:, None] + np.arange(K_STACK)[None, :]
    v2 = e2[:, idx].reshape(-1, s, K_STACK * J_BANDS)
    vlive = ((jnp.arange(s) + K_STACK) <= kcount).astype(dt)
    scnt = jnp.maximum(jnp.sum(vlive), 1.0)

    v2 = (v2 - jnp.sum(v2 * vlive[None, :, None], 1, keepdims=True)
          / scnt) * vlive[None, :, None]
    return v2[0], (v2[1] if y is not None else None), scnt


def _capacity(vx: jnp.ndarray, vy: jnp.ndarray, u: jnp.ndarray
              ) -> jnp.ndarray:
    """Gaussian channel capacity (bits/s) in the KLT basis u."""
    kx = vx @ u                                             # [S, KJ]
    ky = vy @ u
    xs = jnp.sum(kx * kx, 0)
    ys = jnp.sum(ky * ky, 0)
    xy = jnp.sum(kx * ky, 0)
    rho2 = (xy * xy) / jnp.maximum(xs * ys, _EPS)
    rho2 = jnp.clip(rho2, 0.0, 1.0 - 1e-7)
    bits_per_vec = -0.5 * jnp.sum(jnp.log2(1.0 - RHO_P2 * rho2))
    frame_rate = FS / HOP
    return bits_per_vec * frame_rate / K_STACK


@jax.jit
def siib_klt_16k(x: jnp.ndarray,
                 n_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """KLT basis (eigenvectors of the stacked-vector covariance) of a clean
    16 kHz signal — a function of the CLEAN side only, so across a training
    run it is constant per reference utterance and can be cached
    (score_corpus's siib_klt_cache).  The eigh here is ~80% of a SIIB score
    on a v5e, so the cache buys ~6x on every epoch after the first."""
    vx, _, scnt = _stack_pair(x, None, n_valid)
    cov = (vx.T @ vx) / scnt                                # [KJ, KJ]
    _, u = jnp.linalg.eigh(cov)
    return u


@jax.jit
def siib_gauss_16k_with_klt(x: jnp.ndarray, y: jnp.ndarray,
                            n_valid: jnp.ndarray | None,
                            u: jnp.ndarray) -> jnp.ndarray:
    """SIIB^Gauss given a precomputed KLT basis for the clean signal
    (siib_klt_16k) — the eigh-free per-epoch path."""
    vx, vy, _ = _stack_pair(x, y, n_valid)
    return _capacity(vx, vy, u)


@jax.jit
def siib_gauss_16k(x: jnp.ndarray, y: jnp.ndarray,
                   n_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """SIIB^Gauss on equal-length 16 kHz signals (bits/s).

    n_valid (optional, traced): true sample count of zero-padded buffers —
    frames past it are excluded exactly, enabling bucketed/vmapped scoring.
    """
    vx, vy, scnt = _stack_pair(x, y, n_valid)
    # KLT from the clean covariance
    cov = (vx.T @ vx) / scnt                                # [KJ, KJ]
    _, u = jnp.linalg.eigh(cov)
    return _capacity(vx, vy, u)


def _vad_mask(x: np.ndarray, window_length=400, window_shift=200,
              delta_db=40.0) -> np.ndarray:
    """Host-side VAD identical to the reference wrapper's get_vad
    (intel.py:37-50): frame power percentile threshold."""
    n = x.shape[-1]
    if n < window_length + 1:
        x = np.pad(x, (0, window_length + 1 - n))
    nfr = (x.shape[-1] - window_length)
    starts = np.arange(0, nfr, window_shift)
    w = np.hanning(window_length + 2)[1:-1]
    # one fancy-indexed gather (a per-frame Python slice loop ran once per
    # utterance per scoring chunk)
    frames = x[starts[:, None] + np.arange(window_length)[None, :]] * w
    xdb = 10 * np.log10((frames ** 2).mean(axis=1) + _EPS)
    ind = int(round(len(xdb) * 0.999) - 1)
    max_x = np.partition(xdb, ind)[ind]
    return xdb > (max_x - delta_db)


def siib_prepare(x, y, fs: int = 16000, bucket: int | None = None):
    """Host-side wrapper prep (reference intel.py:79-100): trim, resample,
    VAD tile-to-20s, and optionally zero-pad to a fixed bucket length.

    Returns (x_t, y_t, n_valid).  With `bucket`, all utterances come out at
    one shape so the jitted core compiles once and vmaps.
    """
    n = min(x.shape[-1], y.shape[-1])
    x = np.asarray(x)[..., :n]
    y = np.asarray(y)[..., :n]
    if fs != FS:
        from math import gcd
        g = gcd(FS, fs)
        x = np.asarray(resample_poly(jnp.asarray(x), FS // g, fs // g))
        y = np.asarray(resample_poly(jnp.asarray(y), FS // g, fs // g))
    vad = _vad_mask(x)
    active_sec = vad.sum() / (FS / HOP)
    if active_sec < 20:
        m = max(int(np.floor(25.0 / max(active_sec, 0.25))), 1)
        x = np.tile(x, m)
        y = np.tile(y, m)
    n_valid = x.shape[-1]
    if bucket is not None:
        assert n_valid <= bucket, (n_valid, bucket)
        x = np.pad(x, (0, bucket - n_valid))
        y = np.pad(y, (0, bucket - n_valid))
    return x, y, n_valid


def siib(x, y, fs: int = 16000, use_vad_tiling: bool = True) -> jnp.ndarray:
    """SIIB^Gauss with the reference wrapper's tile-to-20s rule
    (intel.py:79-100): if active speech is shorter than 20 s the pair is
    tiled M = floor(25 / active_seconds) times before scoring."""
    if use_vad_tiling:
        x, y, _ = siib_prepare(x, y, fs)
    else:
        n = min(x.shape[-1], y.shape[-1])
        x = np.asarray(x)[..., :n]
        y = np.asarray(y)[..., :n]
    return siib_gauss_16k(jnp.asarray(x), jnp.asarray(y))
