"""Second, independent derivation of the P.862 16 kHz perceptual tables.

`nelegan_tpu.metrics.pesq` re-derives the Bark band layout, band widths,
absolute hearing thresholds, and the wideband input filter from the
published formulas instead of copying the (non-redistributable) ITU
tables.  This module derives the SAME tables a second time with different
numerics so a typo or indexing slip in either derivation shows up as a
diff (tools/calibration_audit.py publishes the deltas):

  * band-edge frequencies via bisection root-finding on the Zwicker
    curve (the package assigns bins by flooring their own Bark value);
  * band-centre frequencies via bisection (the package interpolates on a
    4097-point grid);
  * thresholds from the Terhardt curve at those centres, with the same
    documented anchoring (internal power 1e7 == 79.8 dB SPL -> -9.8 dB
    offset) — the anchor is a shared modelling choice, not re-derived.

No JAX, no nelegan_tpu imports.
"""
from __future__ import annotations

import numpy as np

FS = 16000
N_FFT = 512
N_BARK = 49


def _bark(f):
    f = np.asarray(f, np.float64)
    return 13.0 * np.arctan(0.00076 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)


def _inv_bark(z: float, lo: float = 0.0, hi: float = FS / 2.0) -> float:
    """Frequency with _bark(f) == z, by bisection (curve is monotone)."""
    for _ in range(80):
        mid = 0.5 * (lo + hi)
        if _bark(mid) < z:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def bark_tables_oracle():
    """(assignment matrix [49, 257], widths [49], centres (Bark) [49],
    absolute threshold internal power [49], WB filter power gain [257])
    — same contract as metrics.pesq._bark_tables()."""
    n_bins = N_FFT // 2 + 1
    f = np.arange(n_bins) * (FS / N_FFT)
    zmax = float(_bark(FS / 2.0))
    width = zmax / N_BARK

    # Hz edges of the uniform-Bark bands, then bin -> band by Hz interval
    edges_hz = np.array([_inv_bark(i * width) for i in range(N_BARK + 1)])
    edges_hz[0], edges_hz[-1] = 0.0, FS / 2.0 + 1.0
    band = np.searchsorted(edges_hz, f, side="right") - 1
    band = np.clip(band, 0, N_BARK - 1)
    m = np.zeros((N_BARK, n_bins), np.float64)
    m[band, np.arange(n_bins)] = 1.0

    widths = np.full(N_BARK, width)
    centres = (np.arange(N_BARK) + 0.5) * width
    centre_hz = np.array([_inv_bark(z) for z in centres])

    fk = np.maximum(centre_hz, 20.0) / 1000.0
    thr_db = (3.64 * fk ** -0.8
              - 6.5 * np.exp(-0.6 * (fk - 3.3) ** 2)
              + 1e-3 * fk ** 4)
    abs_thresh = 10.0 ** ((np.clip(thr_db, -10.0, 90.0) - 9.8) / 10.0)

    fc = 100.0
    hp = 1.0 / (1.0 + (fc / np.maximum(f, 1e-3)) ** 8)
    hp[0] = 0.0
    return m, widths, centres, abs_thresh, hp
