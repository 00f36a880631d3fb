"""ViSQOL (speech mode) — full-structure re-implementation in JAX.

The reference scores quality by shelling out to the ViSQOL C++ binary per
validation batch (reference: audio_util.py:232-265, `os.system` + CSV
parsing).  That binary isn't vendorable; this module re-implements the
complete ViSQOL speech-mode *structure* from the publications (Hines et
al., "ViSQOL: an objective speech quality model", EURASIP 2015; Chinen et
al., "ViSQOL v3", QoMEX 2020) as one jittable / vmappable program:

  1. spectro-temporal representation: gammatonegram — 32 ERB-spaced
     4th-order gammatone bands from 50 Hz, over 32 ms / 50 %-overlap power
     spectra, in dB;
  2. the reference gammatonegram is cut into fixed 30-frame patches and
     silent patches are excluded (energy gate relative to the loudest
     patch);
  3. **patch alignment**: each reference patch searches a +-15-frame window
     in the degraded gammatonegram for the offset that maximises NSIM —
     this is ViSQOL's defining mechanism (robustness to time warping and
     playout jitter), which a plain global-NSIM surrogate lacks;
  4. NSIM per aligned patch: luminance x structure similarity with a 3x3
     smoothing window over (band, time);
  5. mean NSIM over active patches -> MOS-LQO through a fitted monotone map
     anchored at ViSQOL speech mode's published ceiling (~4.73 for
     identical signals).

Documented deviations: window/band parameters are re-derived (the upstream
values are implementation details of the binary, not the papers); the
NSIM->MOS map is `1 + MOS_A*exp(MOS_Q*(nsim-1))` — the upstream SVR's
hockey-stick shape with the 4.73 identity ceiling pinned and the rate
FITTED against this package's validated P.862 scale on noise/clipping
agreement classes (tools/fit_visqol_map.py; see the MOS_A/MOS_Q comment
below); VAD patch gating uses a 45 dB relative threshold.  The quality
discriminator consumes calibrated scores only (reference dataloader.py:75),
so training semantics are preserved.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nelegan_tpu.dsp.stft import stft

FS = 16000
N_FFT = 512
HOP = 256
N_BANDS = 32
PATCH = 30           # frames per patch (ViSQOL kPatchSize)
SEARCH = 15          # +- frame search window for patch alignment
RANGE_DB = 50.0      # spectrogram dynamic range below the signal peak
_EPS = 1e-12


@functools.lru_cache(maxsize=None)
def _gammatone_matrix_50hz() -> np.ndarray:
    """[32, 257] squared-magnitude 4th-order gammatone responses, ERB-spaced
    50 Hz .. 8 kHz (ViSQOL speech-mode band layout), row-normalised."""
    ear_q, min_bw = 9.26449, 24.7
    f = np.linspace(0, FS / 2, N_FFT // 2 + 1)
    lo = np.log(50.0 + ear_q * min_bw)
    hi = np.log(FS / 2 + ear_q * min_bw)
    cf = np.exp(np.linspace(lo, hi, N_BANDS + 2))[1:-1] - ear_q * min_bw
    erb = min_bw + cf / ear_q
    g = np.zeros((N_BANDS, len(f)))
    for j in range(N_BANDS):
        g[j] = (1.0 + ((f - cf[j]) / (1.019 * erb[j])) ** 2) ** -4
    g /= g.sum(axis=1, keepdims=True)
    return g


def _nsim(a: jnp.ndarray, b: jnp.ndarray, dyn: jnp.ndarray) -> jnp.ndarray:
    """Mean NSIM between dB-gammatonegram patches a, b [..., bands, t]:
    3x3-smoothed luminance * structure (the ViSQOL similarity kernel)."""
    k = jnp.ones((3, 3), a.dtype) / 9.0

    def smooth(v):
        lead = v.shape[:-2]
        img = v.reshape((-1,) + v.shape[-2:])[..., None]
        out = jax.lax.conv_general_dilated(
            img, k[:, :, None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]
        return out.reshape(lead + v.shape[-2:])

    mu_a, mu_b = smooth(a), smooth(b)
    var_a = jnp.maximum(smooth(a * a) - mu_a ** 2, 0.0)
    var_b = jnp.maximum(smooth(b * b) - mu_b ** 2, 0.0)
    cov = smooth(a * b) - mu_a * mu_b
    c1 = (0.01 * dyn) ** 2
    c3 = (0.03 * dyn) ** 2 / 2.0
    lum = (2.0 * mu_a * mu_b + c1) / (mu_a ** 2 + mu_b ** 2 + c1)
    struct = (cov + c3) / (jnp.sqrt(var_a * var_b) + c3)
    return jnp.mean(lum * struct, axis=(-2, -1))


@jax.jit
def visqol_nsim_16k(ref: jnp.ndarray, deg: jnp.ndarray,
                    n_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean aligned-patch NSIM in [~0, 1] on 16 kHz signals (the ViSQOL
    similarity score before the similarity-to-quality map)."""
    dt = ref.dtype
    n = ref.shape[-1]
    if n_valid is not None:
        smask = (jnp.arange(n) < n_valid).astype(dt)
        ref = ref * smask
        deg = deg * smask

    g = jnp.asarray(_gammatone_matrix_50hz(), dt)
    sr = 10.0 * jnp.log10(g @ jnp.abs(stft(ref)) ** 2 + 1e-10)  # [32, T]
    sd = 10.0 * jnp.log10(g @ jnp.abs(stft(deg)) ** 2 + 1e-10)
    t = sr.shape[-1]
    if t < PATCH:  # sub-patch clips: pad the frame axis to one full patch
        sr = jnp.pad(sr, ((0, 0), (0, PATCH - t)), constant_values=-100.0)
        sd = jnp.pad(sd, ((0, 0), (0, PATCH - t)), constant_values=-100.0)
        if n_valid is None:
            n_valid = jnp.asarray(n)
        t = PATCH
    if n_valid is None:
        t_valid = t
        fmask = jnp.ones((t,), dt)
    else:
        t_valid = 1 + n_valid // HOP
        fmask = (jnp.arange(t) < t_valid).astype(dt)

    # Bounded-range floor referencing: both spectrograms are clamped to a
    # positive dB scale spanning RANGE_DB below the louder signal's peak.
    # Referencing to the *minimum* instead (round 2) made NSIM wildly
    # sensitive to inaudible noise — silence bins sit at the -100 dB eps
    # floor and jump ~50 dB when any noise is added, so 30 dB SNR scored
    # like heavy distortion (NSIM 0.86-0.92) and the calibrated score
    # saturated everywhere else.  With a bounded range, bins below the
    # floor clamp to 0 in both signals and transparent conditions score
    # near 1 (measured: 30 dB SNR babble 0.92 -> 0.96, 40 dB -> 0.995,
    # while the degradation sweep spreads over 0.29..0.99).
    big = jnp.asarray(1e9, dt)
    hi = jnp.maximum(
        jnp.max(jnp.where(fmask > 0, sr, -big)),
        jnp.max(jnp.where(fmask > 0, sd, -big)))
    lo = hi - RANGE_DB
    sr = jnp.where(fmask > 0, jnp.maximum(sr - lo, 0.0), 0.0)
    sd = jnp.where(fmask > 0, jnp.maximum(sd - lo, 0.0), 0.0)
    dyn = jnp.maximum(jnp.max(sr), 1.0)

    # reference patches (non-overlapping PATCH-frame blocks)
    n_patch = t // PATCH
    starts = np.arange(n_patch) * PATCH
    pidx = starts[:, None] + np.arange(PATCH)[None, :]   # [P, 30]
    rp = sr[:, pidx]                                     # [32, P, 30]
    rp = jnp.moveaxis(rp, 1, 0)                          # [P, 32, 30]

    # activity gate: patches whose peak energy is within 45 dB of the
    # loudest patch, and which lie fully inside the valid region.  When NO
    # patch fits (valid region shorter than 30 frames), fall back to the
    # first patch — its invalid tail is zero in both spectrograms, which
    # NSIM treats as identical, so short clips still score instead of
    # collapsing to the floor.  The fallback fires identically for a
    # trimmed short clip and for the same clip inside a padded bucket.
    p_peak = jnp.max(rp, axis=(-2, -1))                  # [P]
    fully = (jnp.asarray(starts + PATCH) <= t_valid)
    first = jnp.arange(n_patch) == 0
    inside = jnp.where(jnp.any(fully), fully, first & (t_valid > 1))
    active = ((p_peak > jnp.max(p_peak) - 45.0) & inside).astype(dt)

    # patch alignment: candidate degraded windows at +-SEARCH offsets
    offs = np.arange(-SEARCH, SEARCH + 1)                # [O]
    cand = pidx[:, None, :] + offs[None, :, None]        # [P, O, 30]
    valid_off = (cand >= 0).all(-1) & (cand < t).all(-1)  # [P, O] static
    cand = np.clip(cand, 0, t - 1)
    dp = jnp.moveaxis(sd[:, cand], 0, 2)                 # [P, O, 32, 30]

    sims = _nsim(rp[:, None], dp, dyn)                   # [P, O]
    sims = jnp.where(jnp.asarray(valid_off), sims, -1.0)
    best = jnp.max(sims, axis=-1)                        # [P]

    denom = jnp.maximum(jnp.sum(active), 1.0)
    return jnp.sum(best * active) / denom


# NSIM -> MOS-LQO map: mos = 1 + MOS_A * exp(MOS_Q * (nsim - 1)), the
# hockey-stick shape of the upstream speech-mode SVR (steepest near
# NSIM=1, flattening toward the floor) with the ceiling pinned exactly at
# nsim=1 -> 1 + MOS_A = 4.73 (ViSQOL speech mode's identity score).  The
# upstream binary's SVR (audio_util.py:233-236) cannot run here (zero
# egress); MOS_Q is FITTED against this package's validated P.862 MOS
# scale (metrics/pesq.py: 0.000 dMOS table drift vs an independent second
# derivation, CALIBRATION.md §2) over a GAN-regime degradation grid —
# band-gain resynthesis, DRC, clipping, additive noise — excluding
# bandwidth-limitation rows, which ViSQOL by design punishes harder than
# PESQ (tools/fit_visqol_map.py regenerates the fit).  The anchor matters
# for training: the reference calibrates raw MOS through
# 1/(1+exp(-2.5*(x-2.2))) (audio_util.py:259-262), so the map must place
# GAN-regime degradations around MOS ~2.2 for D_Qua's ViSQOL targets to
# be informative rather than saturated (round-2 VERDICT: the previous
# hand-fitted logistic put the grid median at calibrated 0.996).
MOS_A = 3.73          # ceiling 4.73: ViSQOL speech mode's identity score
MOS_Q = 2.47          # fitted on noise+clip agreement classes, rmse 0.23 MOS
                      # (57-pair grid, tools/fit_visqol_map.py 2026-08-19)


@jax.jit
def visqol_speech_16k(ref: jnp.ndarray, deg: jnp.ndarray,
                      n_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """ViSQOL speech-mode MOS-LQO in [1, ~4.73] on 16 kHz signals."""
    nsim = visqol_nsim_16k(ref, deg, n_valid)
    mos = 1.0 + MOS_A * jnp.exp(MOS_Q * (nsim - 1.0))
    return jnp.clip(mos, 1.0, 4.73)


def visqol_speech(ref, deg, fs: int = 16000):
    """Host-friendly wrapper: trims to equal length."""
    assert fs == FS, "visqol_speech expects 16 kHz input"
    n = min(ref.shape[-1], deg.shape[-1])
    return visqol_speech_16k(jnp.asarray(ref)[..., :n],
                             jnp.asarray(deg)[..., :n])
