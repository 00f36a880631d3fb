"""Quality metrics: differentiable PESQ-like and ViSQOL-like surrogates.

The reference scores quality with two *external native* engines: the pypesq
C extension (reference: intel.py:9,142-160) and the ViSQOL C++ executable
shelled out per batch (reference: audio_util.py:232-265).  Neither engine is
vendorable, and the quality discriminator D_Qua only ever consumes their
*calibrated scores* (reference: dataloader.py:75, train_nele.py:152), so any
consistent scorer preserves the training semantics.  These surrogates follow
each metric's published core:

  * `pesq_proxy` — P.862-style symmetric/asymmetric Bark-loudness
    disturbance: level alignment, Bark-band power, Zwicker loudness,
    disturbance pooling with the P.862 norms, mapped to a MOS-like scale.
  * `visqol_proxy` — NSIM (Neurogram Similarity Index Measure), the core of
    ViSQOL: SSIM-like luminance*structure similarity over gammatone
    spectrogram patches, mapped to MOS-LQO.

If bit-exact PESQ/ViSQOL numbers are required for publication tables, use
the external engines via metrics.oracles (optional imports); training and
evaluation inside this framework use these on-device surrogates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nelegan_tpu.dsp.stft import stft, hann_periodic

FS = 16000
_EPS = 1e-12


@functools.lru_cache(maxsize=None)
def _bark_matrix(n_bins: int = 257, n_bark: int = 49) -> np.ndarray:
    """Triangular Bark-band pooling matrix [n_bark, n_bins]."""
    f = np.linspace(0, FS / 2, n_bins)
    bark = 13.0 * np.arctan(0.00076 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)
    edges = np.linspace(bark[1], bark[-1], n_bark + 2)
    m = np.zeros((n_bark, n_bins))
    for i in range(n_bark):
        lo, cc, hi = edges[i], edges[i + 1], edges[i + 2]
        up = (bark - lo) / max(cc - lo, 1e-9)
        down = (hi - bark) / max(hi - cc, 1e-9)
        m[i] = np.clip(np.minimum(up, down), 0.0, None)
    m /= np.maximum(m.sum(axis=1, keepdims=True), 1e-9)
    return m


@functools.lru_cache(maxsize=None)
def _hearing_threshold(n_bark: int = 49) -> np.ndarray:
    """Approximate absolute hearing threshold per Bark band (power units
    relative to full scale), ISO 226-flavoured."""
    f = np.linspace(50, FS / 2, n_bark)
    thr_db = (3.64 * (f / 1000.0) ** -0.8
              - 6.5 * np.exp(-0.6 * (f / 1000.0 - 3.3) ** 2)
              + 1e-3 * (f / 1000.0) ** 4)
    return 10.0 ** ((thr_db - 90.0) / 10.0)  # scaled into unit-RMS domain


def _norm_and_mask(ref, deg, n_valid):
    if n_valid is None:
        ref = ref / jnp.maximum(jnp.sqrt(jnp.mean(ref * ref)), _EPS)
        deg = deg / jnp.maximum(jnp.sqrt(jnp.mean(deg * deg)), _EPS)
        return ref, deg, None
    mask = (jnp.arange(ref.shape[-1]) < n_valid).astype(ref.dtype)
    nv = n_valid.astype(ref.dtype)
    ref = ref * mask / jnp.maximum(
        jnp.sqrt(jnp.sum(ref * ref * mask) / nv), _EPS)
    deg = deg * mask / jnp.maximum(
        jnp.sqrt(jnp.sum(deg * deg * mask) / nv), _EPS)
    # centered-STFT valid frame count (hop 256)
    return ref, deg, 1 + n_valid // 256


@jax.jit
def pesq_proxy_16k(ref: jnp.ndarray, deg: jnp.ndarray,
                   n_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """PESQ-like MOS in roughly [1, 4.6] on equal-length 16 kHz signals."""
    dt = ref.dtype
    # level alignment (P.862 aligns both to a fixed listening level)
    ref, deg, t_valid = _norm_and_mask(ref, deg, n_valid)

    sr = jnp.abs(stft(ref)) ** 2       # [257, T]
    sd = jnp.abs(stft(deg)) ** 2
    if t_valid is not None:
        fm = (jnp.arange(sr.shape[-1]) < t_valid).astype(dt)
        sr = sr * fm
        sd = sd * fm
    bark = jnp.asarray(_bark_matrix(), dt)
    thr = jnp.asarray(_hearing_threshold(), dt)[:, None]
    br = bark @ sr + _EPS              # [49, T]
    bd = bark @ sd + _EPS

    # Zwicker loudness above hearing threshold
    def loud(b):
        s = (thr / 0.5) ** 0.23 * ((0.5 + 0.5 * b / thr) ** 0.23 - 1.0)
        return jnp.maximum(s, 0.0) * 32.0

    lr = loud(br)
    ld = loud(bd)
    d = ld - lr
    # masking-style deadzone: small differences are inaudible
    dead = 0.25 * jnp.minimum(lr, ld)
    d_sym = jnp.maximum(jnp.abs(d) - dead, 0.0)
    # asymmetry: additive components (deg louder) weigh more
    asym = jnp.clip(((bd + 50.0 * thr) / (br + 50.0 * thr)) ** 1.2, 0.0, 12.0)
    asym = jnp.where(asym < 3.0, 0.0, asym)
    d_asym = d_sym * asym

    # pooling: relative band-L2 disturbance per frame, gated by reference
    # activity (P.862's VAD-like weighting keeps noise-in-silence from
    # dominating), L3 over time, then a saturating exponential MOS map
    t = sr.shape[-1]
    if t_valid is None:
        fmask = jnp.ones((t,), dt)
        denom_t = float(t)
    else:
        fmask = (jnp.arange(t) < t_valid).astype(dt)
        denom_t = t_valid.astype(dt)
    act = jnp.sum(lr, axis=0)
    act_mean = jnp.sum(act * fmask) / denom_t
    gate = jnp.clip(act / (0.5 * act_mean), 0.0, 1.0) * fmask
    ref_loud = jnp.sqrt(jnp.sum(lr ** 2, axis=0)) + 1.0
    frame_sym = jnp.sqrt(jnp.sum(d_sym ** 2, axis=0)) / ref_loud * gate
    frame_asym = jnp.sum(d_asym, axis=0) / (act + 100.0) * gate

    def lp_time(v, p):
        return (jnp.sum((v ** p) * fmask) / denom_t + _EPS) ** (1.0 / p)

    d1 = lp_time(frame_sym, 3.0)
    d2 = lp_time(frame_asym, 3.0)
    mos = 1.0 + 3.5 * jnp.exp(-0.35 * d1 - 0.08 * d2)
    return jnp.clip(mos, 1.0, 4.6)


@jax.jit
def visqol_proxy_16k(ref: jnp.ndarray, deg: jnp.ndarray,
                     n_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """NSIM-based ViSQOL-like MOS-LQO in [1, 5] on 16 kHz signals."""
    from nelegan_tpu.metrics.siib import _gammatone_matrix
    dt = ref.dtype
    ref, deg, t_valid = _norm_and_mask(ref, deg, n_valid)
    g = jnp.asarray(_gammatone_matrix(), dt)       # [40, 257]
    nr = 10.0 * jnp.log10(g @ jnp.abs(stft(ref)) ** 2 + 1e-10)  # [40, T]
    nd = 10.0 * jnp.log10(g @ jnp.abs(stft(deg)) ** 2 + 1e-10)
    if t_valid is None:
        lo = jnp.minimum(jnp.min(nr), jnp.min(nd))
        nr = nr - lo
        nd = nd - lo
    else:
        # min/max and the dynamic-range constants must see only valid
        # frames, or an utterance's score would depend on its bucket size
        fm = jnp.arange(nr.shape[-1]) < t_valid
        big = jnp.asarray(1e9, dt)
        lo = jnp.minimum(jnp.min(jnp.where(fm, nr, big)),
                         jnp.min(jnp.where(fm, nd, big)))
        nr = jnp.where(fm, nr - lo, 0.0)
        nd = jnp.where(fm, nd - lo, 0.0)

    # NSIM with a 3x3 smoothing window: luminance * structure
    def smooth(v):
        k = jnp.ones((3, 3), dt) / 9.0
        return jax.lax.conv_general_dilated(
            v[None, :, :, None], k[:, :, None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]

    mu_r, mu_d = smooth(nr), smooth(nd)
    var_r = jnp.maximum(smooth(nr * nr) - mu_r ** 2, 0.0)
    var_d = jnp.maximum(smooth(nd * nd) - mu_d ** 2, 0.0)
    cov = smooth(nr * nd) - mu_r * mu_d
    dyn = jnp.maximum(jnp.max(nr), 1.0)
    c1 = (0.01 * dyn) ** 2
    c3 = (0.03 * dyn) ** 2 / 2.0
    lum = (2.0 * mu_r * mu_d + c1) / (mu_r ** 2 + mu_d ** 2 + c1)
    struct = (cov + c3) / (jnp.sqrt(var_r * var_d) + c3)
    if t_valid is None:
        nsim = jnp.mean(lum * struct)
    else:
        fm2 = (jnp.arange(nr.shape[-1]) < t_valid).astype(dt)[None, :]
        nsim = jnp.sum(lum * struct * fm2) / (nr.shape[0]
                                              * t_valid.astype(dt))
    # map mean NSIM -> MOS-LQO (ViSQOL uses an SVR; affine surrogate here)
    return jnp.clip(1.0 + 4.0 * nsim ** 3, 1.0, 5.0)


def pesq_proxy(ref, deg, fs: int = 16000):
    n = min(ref.shape[-1], deg.shape[-1])
    assert fs == FS, "pesq_proxy expects 16 kHz input"
    return pesq_proxy_16k(jnp.asarray(ref)[..., :n], jnp.asarray(deg)[..., :n])


def visqol_proxy(ref, deg, fs: int = 16000):
    n = min(ref.shape[-1], deg.shape[-1])
    assert fs == FS, "visqol_proxy expects 16 kHz input"
    return visqol_proxy_16k(jnp.asarray(ref)[..., :n],
                            jnp.asarray(deg)[..., :n])
