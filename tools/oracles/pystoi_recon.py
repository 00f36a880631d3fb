"""Reconstruction of the pystoi PACKAGE (not the paper) from memory.

Round-2 VERDICT item 7: the reference scores ESTOI through pystoi
(/root/reference/intel.py:8), which is neither installed here nor
fetchable (zero egress), so an engine-run golden is impossible.  The
existing oracle (estoi_np.py) was derived from the Jensen & Taal 2016
paper by the same builder as the JAX implementation — a shared
misreading of pystoi-SPECIFIC behavior (not in the paper) would pass
both.  This file is a third channel: a line-by-line reconstruction of
the published MIT package (github.com/mpariente/pystoi, utils.py +
stoi.py) written from memory of that source, deliberately PRESERVING its
implementation quirks rather than deriving from the paper:

  * `np.hanning(framelen + 2)[1:-1]` window (open Hann);
  * exclusive framing `range(0, len(x) - framelen, hop)` — the final
    frame is dropped even when it fits exactly;
  * silence mask from the CLEAN signal's frame energies only,
    `20*log10(norm + eps)`, threshold `max - 40 dB`, applied to both;
  * masked frames overlap-added (not concatenated) into shortened
    signals of length `(n_kept - 1)*hop + framelen`;
  * `thirdoct` band edges `150 * 2**((2k -/+ 1)/6)` snapped to FFT bins
    by squared-distance argmin, bands filled `[fl:fh)` (half-open);
  * ESTOI: 30-frame sliding segments, rows (per-band trajectories)
    mean-removed + unit-normalised, then columns (per-frame vectors),
    correlation summed / N, averaged over segments.

Honest labeling: this is memory of source code, not an execution of it —
agreement with the JAX implementation bounds the shared-misreading risk
through an independent channel but is NOT an engine-run golden.  If
pystoi ever becomes installable, replace this with captured outputs
(metrics/oracles.py has the hooks).
"""
from __future__ import annotations

import numpy as np

EPS = np.finfo("float").eps


def _thirdoct(fs, nfft, num_bands, min_freq):
    f = np.linspace(0, fs, nfft + 1)
    f = f[: int(nfft / 2) + 1]
    k = np.array(range(num_bands)).astype(float)
    cf = np.power(2.0 ** (1.0 / 3), k) * min_freq
    freq_low = min_freq * np.power(2.0, (2 * k - 1) / 6)
    freq_high = min_freq * np.power(2.0, (2 * k + 1) / 6)
    obm = np.zeros((num_bands, len(f)))
    for i in range(len(cf)):
        f_bin = np.argmin(np.square(f - freq_low[i]))
        freq_low[i] = f[f_bin]
        fl_ii = f_bin
        f_bin = np.argmin(np.square(f - freq_high[i]))
        freq_high[i] = f[f_bin]
        fh_ii = f_bin
        obm[i, fl_ii:fh_ii] = 1
    return obm, cf


def _stft(x, win_size, fft_size, overlap=4):
    hop = int(win_size / overlap)
    w = np.hanning(win_size + 2)[1:-1]
    frames = [w * x[i:i + win_size]
              for i in range(0, len(x) - win_size, hop)]
    return np.fft.rfft(np.array(frames), n=fft_size)


def _remove_silent_frames(x, y, dyn_range, framelen, hop):
    w = np.hanning(framelen + 2)[1:-1]
    x_frames = np.array([w * x[i:i + framelen]
                         for i in range(0, len(x) - framelen, hop)])
    y_frames = np.array([w * y[i:i + framelen]
                         for i in range(0, len(x) - framelen, hop)])
    x_energies = 20 * np.log10(np.linalg.norm(x_frames, axis=1) + EPS)
    mask = (np.max(x_energies) - dyn_range - x_energies) < 0
    x_frames = x_frames[mask]
    y_frames = y_frames[mask]
    n_sil = (len(x_frames) - 1) * hop + framelen
    x_sil = np.zeros(n_sil)
    y_sil = np.zeros(n_sil)
    for i in range(x_frames.shape[0]):
        x_sil[i * hop: i * hop + framelen] += x_frames[i]
        y_sil[i * hop: i * hop + framelen] += y_frames[i]
    return x_sil, y_sil


def estoi_pystoi_10k(x, y):
    """pystoi.stoi(x, y, 10000, extended=True), reconstructed.

    Operates at 10 kHz directly (the package resamples with
    scipy.signal.resample_poly first; callers here resample the same way,
    so the comparison isolates the metric core)."""
    FS = 10000
    N_FRAME = 256
    NFFT = 512
    NUMBAND = 15
    MINFREQ = 150
    N = 30
    DYN_RANGE = 40

    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    obm, _ = _thirdoct(FS, NFFT, NUMBAND, MINFREQ)
    x, y = _remove_silent_frames(x, y, DYN_RANGE, N_FRAME, N_FRAME // 2)
    # stoi.py passes overlap=2 (hop = framelen/2); utils.stft's own
    # default is overlap=4
    x_spec = _stft(x, N_FRAME, NFFT, overlap=2).T   # [257, F]
    y_spec = _stft(y, N_FRAME, NFFT, overlap=2).T
    x_tob = np.sqrt(np.matmul(obm, np.square(np.abs(x_spec))))  # [15, F]
    y_tob = np.sqrt(np.matmul(obm, np.square(np.abs(y_spec))))

    # [S, 15, N] sliding segments
    x_segments = np.array([x_tob[:, m - N: m]
                           for m in range(N, x_tob.shape[1] + 1)])
    y_segments = np.array([y_tob[:, m - N: m]
                           for m in range(N, x_tob.shape[1] + 1)])

    # row/col normalization.  The package dithers with
    # EPS * np.random.standard_normal before each normalization to dodge
    # zero-norm rows (row_col_normalize); that perturbs scores at ~1e-16
    # and would make this reconstruction stochastic, so it is omitted —
    # the comparison tolerance (1e-7) is far above its effect.
    x_n = x_segments - np.mean(x_segments, axis=2, keepdims=True)
    x_n /= (np.linalg.norm(x_n, axis=2, keepdims=True) + EPS)
    x_n -= np.mean(x_n, axis=1, keepdims=True)
    x_n /= (np.linalg.norm(x_n, axis=1, keepdims=True) + EPS)
    y_n = y_segments - np.mean(y_segments, axis=2, keepdims=True)
    y_n /= (np.linalg.norm(y_n, axis=2, keepdims=True) + EPS)
    y_n -= np.mean(y_n, axis=1, keepdims=True)
    y_n /= (np.linalg.norm(y_n, axis=1, keepdims=True) + EPS)
    d = np.sum(x_n * y_n, axis=(1, 2)) / N
    return float(d.mean())
