"""SIIB^Gauss oracle — plain numpy, straight from the publications.

S. Van Kuyk, W. B. Kleijn, R. C. Hendriks, "An instrumental intelligibility
metric based on information theory", IEEE SPL 25(1), 2018, and
"An evaluation of intrusive instrumental intelligibility metrics",
IEEE/ACM TASLP 26(11), 2018 (the SIIB^Gauss closed-form variant the
reference uses via pysiib: /root/reference/intel.py:4,77
`SIIB(x, y, fs, gauss=True)`).

Algorithm (all dynamic-shape numpy, nothing shared with nelegan_tpu):
  1. operate at 16 kHz (scipy polyphase resample otherwise);
  2. silence removal: 400/200 Hann-windowed frames of the CLEAN signal
     >40 dB below the loudest frame are dropped from both signals (frame
     selection — the frames themselves feed the filterbank);
  3. 512-point rFFT power spectra -> 40 ERB-spaced (100..6500 Hz)
     4th-order gammatone band log-energies;
  4. per-band mean removal over time;
  5. stacking of K=15 consecutive frames into supervectors, mean removed;
  6. KLT: eigenbasis of the clean supervector covariance;
  7. per-KLT-dimension correlation rho_j between clean and degraded,
     Gaussian capacity with production-noise floor rho_p^2 = 0.75:
         I = -0.5 * sum_j log2(1 - 0.75 * rho_j^2)   bits per supervector
         SIIB = I * (fs / hop) / K                   bits per second
"""
from __future__ import annotations

from fractions import Fraction

import numpy as np
import scipy.signal

FS = 16000
WIN = 400
HOP = 200
NFFT = 512
N_CHANNELS = 40
F_LO = 100.0
F_HI = 6500.0
K = 15
RHO_P2 = 0.75
DYN_RANGE = 40.0
EPS = np.finfo(np.float64).eps


def _frame_list(x: np.ndarray, framelen: int, hop: int) -> np.ndarray:
    return np.array([x[i:i + framelen]
                     for i in range(0, len(x) - framelen, hop)])


def _gammatone_fb() -> np.ndarray:
    """[40, 257] squared-magnitude 4th-order gammatone filterbank,
    ERB-rate-spaced centre frequencies, rows normalised to unit sum."""
    f = np.linspace(0.0, FS / 2.0, NFFT // 2 + 1)
    # Glasberg & Moore ERB scale: centre frequencies uniformly spaced on
    # the warped axis log(f + Q*minBW), i.e. equal ERB-rate increments
    ear_q, min_bw = 9.26449, 24.7
    lo = np.log(F_LO + ear_q * min_bw)
    hi = np.log(F_HI + ear_q * min_bw)
    cf = np.exp(np.linspace(lo, hi, N_CHANNELS)) - ear_q * min_bw
    erb = min_bw + cf / ear_q
    fb = np.zeros((N_CHANNELS, f.size))
    for j in range(N_CHANNELS):
        fb[j] = (1.0 + ((f - cf[j]) / (1.019 * erb[j])) ** 2) ** -4.0
        fb[j] /= fb[j].sum()
    return fb


def siib_gauss_oracle(x: np.ndarray, y: np.ndarray,
                      fs: int = 16000) -> float:
    """SIIB^Gauss (bits/s) of degraded y against clean x."""
    n = min(len(x), len(y))
    x = np.asarray(x, np.float64)[:n]
    y = np.asarray(y, np.float64)[:n]
    if fs != FS:
        r = Fraction(FS, fs)
        x = scipy.signal.resample_poly(x, r.numerator, r.denominator)
        y = scipy.signal.resample_poly(y, r.numerator, r.denominator)

    w = np.hanning(WIN + 2)[1:-1]
    xf = _frame_list(x, WIN, HOP) * w
    yf = _frame_list(y, WIN, HOP) * w
    energy_db = 20.0 * np.log10(np.linalg.norm(xf, axis=1) + EPS)
    keep = energy_db > energy_db.max() - DYN_RANGE
    xf, yf = xf[keep], yf[keep]

    fb = _gammatone_fb()
    ex = np.log(np.abs(np.fft.rfft(xf, NFFT, axis=1)) ** 2 @ fb.T + EPS)
    ey = np.log(np.abs(np.fft.rfft(yf, NFFT, axis=1)) ** 2 @ fb.T + EPS)
    ex -= ex.mean(axis=0, keepdims=True)             # per-band mean removal
    ey -= ey.mean(axis=0, keepdims=True)

    n_vec = ex.shape[0] - K + 1
    vx = np.array([ex[i:i + K].ravel() for i in range(n_vec)])
    vy = np.array([ey[i:i + K].ravel() for i in range(n_vec)])
    vx -= vx.mean(axis=0, keepdims=True)
    vy -= vy.mean(axis=0, keepdims=True)

    cov = vx.T @ vx / n_vec
    _, u = np.linalg.eigh(cov)
    kx = vx @ u
    ky = vy @ u
    num = (kx * ky).sum(axis=0) ** 2
    den = (kx * kx).sum(axis=0) * (ky * ky).sum(axis=0)
    rho2 = np.clip(num / np.maximum(den, EPS), 0.0, 1.0 - 1e-7)
    bits = -0.5 * np.sum(np.log2(1.0 - RHO_P2 * rho2))
    return float(bits * (FS / HOP) / K)
