"""ESTOI oracle — plain numpy, straight from the publication.

J. Jensen and C. H. Taal, "An Algorithm for Predicting the Intelligibility
of Speech Masked by Modulated Noise Maskers", IEEE/ACM TASLP 24(11), 2016,
with the pystoi parameterisation the reference depends on
(/root/reference/intel.py:8,126 — `stoi(x, y, fs, extended=True)`):

  * 10 kHz operating rate; 256-sample Hann frames, 50% overlap, 512 FFT;
  * silence removal: frames whose energy is >40 dB below the loudest frame
    of the CLEAN signal are dropped from both signals, the survivors
    overlap-added back into shortened signals;
  * 15 one-third-octave bands starting at 150 Hz;
  * ESTOI: length-30 spectrogram segments, rows (band trajectories) then
    columns (frames) mean-removed and unit-normalised, correlation
    averaged over segments.

Everything here is dynamic-shape numpy — no masking, no bucketing, no code
shared with nelegan_tpu.  Used only by tests and audit tools.
"""
from __future__ import annotations

from fractions import Fraction

import numpy as np
import scipy.signal

FS = 10000
FRAME = 256
HOP = 128
NFFT = 512
N_BANDS = 15
MIN_FREQ = 150.0
SEG = 30
DYN_RANGE = 40.0
EPS = np.finfo(np.float64).eps


def _hann(n: int) -> np.ndarray:
    # periodic-style open Hann: endpoints excluded (pystoi convention)
    return np.hanning(n + 2)[1:-1]


def _frame_list(x: np.ndarray, framelen: int, hop: int) -> np.ndarray:
    """Frames starting at 0, hop, ... while start < len(x) - framelen."""
    return np.array([x[i:i + framelen]
                     for i in range(0, len(x) - framelen, hop)])


def _remove_silent_frames(x: np.ndarray, y: np.ndarray):
    w = _hann(FRAME)
    xf = _frame_list(x, FRAME, HOP) * w
    yf = _frame_list(y, FRAME, HOP) * w
    energy_db = 20.0 * np.log10(np.linalg.norm(xf, axis=1) + EPS)
    keep = energy_db > energy_db.max() - DYN_RANGE
    xf, yf = xf[keep], yf[keep]
    out_len = (len(xf) - 1) * HOP + FRAME
    x_sil = np.zeros(out_len)
    y_sil = np.zeros(out_len)
    for i in range(len(xf)):
        x_sil[i * HOP:i * HOP + FRAME] += xf[i]
        y_sil[i * HOP:i * HOP + FRAME] += yf[i]
    return x_sil, y_sil


def _third_octave_bands(spec_pow: np.ndarray) -> np.ndarray:
    """[F, 257] power spectrogram -> [15, F] band envelopes."""
    f = np.linspace(0, FS, NFFT + 1)[:NFFT // 2 + 1]
    env = np.zeros((N_BANDS, spec_pow.shape[0]))
    for k in range(N_BANDS):
        f_lo = MIN_FREQ * 2.0 ** ((2 * k - 1) / 6.0)
        f_hi = MIN_FREQ * 2.0 ** ((2 * k + 1) / 6.0)
        lo = int(np.argmin((f - f_lo) ** 2))
        hi = int(np.argmin((f - f_hi) ** 2))
        env[k] = np.sqrt(spec_pow[:, lo:hi].sum(axis=1))
    return env


def estoi_oracle(x: np.ndarray, y: np.ndarray, fs: int = 10000) -> float:
    """ESTOI of degraded y against clean x (equal lengths enforced)."""
    n = min(len(x), len(y))
    x = np.asarray(x, np.float64)[:n]
    y = np.asarray(y, np.float64)[:n]
    if fs != FS:
        r = Fraction(FS, fs)
        x = scipy.signal.resample_poly(x, r.numerator, r.denominator)
        y = scipy.signal.resample_poly(y, r.numerator, r.denominator)
    x, y = _remove_silent_frames(x, y)

    w = _hann(FRAME)
    xs = np.abs(np.fft.rfft(_frame_list(x, FRAME, HOP) * w, NFFT,
                            axis=1)) ** 2
    ys = np.abs(np.fft.rfft(_frame_list(y, FRAME, HOP) * w, NFFT,
                            axis=1)) ** 2
    xe = _third_octave_bands(xs)                     # [15, F]
    ye = _third_octave_bands(ys)

    n_frames = xe.shape[1]
    scores = []
    for m in range(SEG, n_frames + 1):
        xseg = xe[:, m - SEG:m]
        yseg = ye[:, m - SEG:m]

        def norm_rows_cols(s):
            s = s - s.mean(axis=1, keepdims=True)
            s = s / (np.linalg.norm(s, axis=1, keepdims=True) + EPS)
            s = s - s.mean(axis=0, keepdims=True)
            s = s / (np.linalg.norm(s, axis=0, keepdims=True) + EPS)
            return s

        xn = norm_rows_cols(xseg)
        yn = norm_rows_cols(yseg)
        scores.append(float(np.sum(xn * yn)) / SEG)
    return float(np.mean(scores))
