"""HASPI v1 / v2 and HASQI v2 on-device metrics.

JAX re-architecture of the reference pyHASPI package
(reference: pyHASPI/pyhaspi2.py).  The scores are differentiable end to end
(the ear model and modulation chains are smooth except for clip/round sites)
and jit/vmap-friendly, so metric scoring of a whole validation batch is one
XLA program instead of a 32-process CPU pool
(reference: audio_util.py:146-227).

Randomness: the reference injects unseeded Gaussian noise in two places
(BM noise, pyhaspi2.py:1091-1095; cepstral dither, :362-365).  Here both take
an explicit PRNG key; `noise_scale=0.0` (default) is the deterministic mode
that matches the committed goldens.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nelegan_tpu.dsp.resample import resample_poly
from nelegan_tpu.metrics.haspi.ear_model import (
    ear_model, center_freq, _ear_core, loss_parameters, middle_ear,
    group_delay_comp, NCHAN)
from nelegan_tpu.metrics.haspi import chains


def _rms_normalize_one(x, n_valid=None):
    # the rms guard keeps an all-zero / zero-length signal at zero instead
    # of 0/0 NaN (one corrupt silent file would otherwise NaN the whole
    # scoring chunk and the discriminator targets built from it)
    def _div(sig, rms):
        return sig / jnp.where(rms > 0.0, rms, 1.0)[..., None]

    if n_valid is None:
        n = x.shape[-1]
        return _div(x, jnp.sqrt(jnp.sum(x * x, -1) / n))
    # masked rms over the valid prefix; also silence any pad-tail content
    mask = (jnp.arange(x.shape[-1]) < n_valid).astype(x.dtype)
    nv = jnp.maximum(jnp.asarray(n_valid).astype(x.dtype), 1.0)
    return _div(x * mask, jnp.sqrt(jnp.sum(x * x * mask, -1) / nv))


def _rms_normalize(x, y, n_valid=None):
    return _rms_normalize_one(x, n_valid), _rms_normalize_one(y, n_valid)


def resample_to_24k(x: jnp.ndarray, fs: int) -> jnp.ndarray:
    """Reference eb_Resamp24kHz (pyhaspi2.py:810-821): polyphase resample to
    24 kHz with RMS restoration."""
    if fs == 24000:
        return x
    if fs > 24000:
        raise NotImplementedError("downsampling to 24k not supported")
    from math import gcd
    g = gcd(24000, fs)
    y = resample_poly(x, 24000 // g, fs // g)
    rx = jnp.sqrt(jnp.mean(x * x, -1, keepdims=True))
    ry = jnp.sqrt(jnp.mean(y * y, -1, keepdims=True))
    return (rx / ry) * y


HASPI_V2_WEIGHTS = np.array([1.361, 1.521, 1.164, 0.492, 0.436, 0.690,
                             1.142, 0.816, 1.576, 2.269])


@functools.partial(jax.jit, static_argnames=("level1", "noise_scale",
                                             "itype"))
def haspi_v2_24k(x24: jnp.ndarray, y24: jnp.ndarray, level1: float = 65.0,
                 key: jax.Array | None = None, noise_scale: float = 0.0,
                 n_valid: jnp.ndarray | None = None,
                 hl: jnp.ndarray | None = None, itype: int = 0):
    """HASPI version 2 on pre-aligned equal-length 24 kHz signals
    (reference haspi_v2, pyhaspi2.py:76-107).  Returns (score, aveCM[10]).

    hl ([6] audiogram at 250..6000 Hz, default normal hearing) matches the
    reference's HL argument; itype=1 additionally runs the NAL-R
    compensated reference-input path (ear_model.nalr_apply — the
    reference's own eb_NALR is an unimplemented stub, pyhaspi2.py:830).

    n_valid (traced, optional): true sample count of zero-padded buffers;
    scoring then matches trimmed-signal scoring (bucketed/vmapped use)."""
    x24, y24 = _rms_normalize(x24, y24, n_valid)
    if key is None:
        key = jax.random.PRNGKey(0)
    k_ear, k_cep = jax.random.split(key)
    ear = ear_model(x24, y24, hl=hl, itype=itype, level1=level1, key=k_ear,
                    noise_scale=noise_scale, n_valid=n_valid)
    xlp, ylp = chains.env_filt(ear.xdb, ear.ydb, 320.0, 2560.0)
    xcep, ycep, count = chains.cep_coef(xlp, ylp, 2.5, 0.1, 6, key=k_cep,
                                        noise_scale=noise_scale)
    avecm = chains.mod_filt_corr(xcep, ycep, count, 2560.0)
    weights = jnp.asarray(HASPI_V2_WEIGHTS, x24.dtype)
    return jnp.sum(weights * avecm), avecm


def _single_side_ear(sig24: jnp.ndarray, level1: float, n_valid):
    """One normal-hearing side of the ear model (itype=0 scoring path).
    Returns (db [nchan, n] pre-group-delay, bw_sig [nchan])."""
    dt = sig24.dtype
    cfreq = center_freq(NCHAN)
    hl0 = jnp.zeros(6, dt)
    attn_ohc, bw_min, lowknee, cr, attn_ihc = loss_parameters(hl0, cfreq)
    _, bw1, _, _, _ = loss_parameters(jnp.full(6, 100.0, dt), cfreq)
    mids = sig24[None]        # [1, n]; middle ear applied in _ear_core
    side_params = tuple(a[:, None] for a in
                        (bw_min, attn_ohc, lowknee, cr, attn_ihc))
    db, _, _, _, bw_sig = _ear_core(mids, bw1, side_params, cfreq, level1,
                                    n_valid)
    return db[:, 0], bw_sig[:, 0]


def _tail_mask(db: jnp.ndarray, n_valid):
    if n_valid is None:
        return db
    return db * (jnp.arange(db.shape[-1]) < n_valid).astype(db.dtype)


@functools.partial(jax.jit, static_argnames=("level1",))
def haspi_v2_clean_24k(x24: jnp.ndarray, level1: float = 65.0,
                       n_valid: jnp.ndarray | None = None):
    """Clean-side half of HASPI v2 — a function of the reference signal
    ONLY, so it can be computed once per clean utterance and reused across
    training epochs (score_corpus's clean_cache): the ear model is ~90% of a
    HASPI score, and in a (fixed clean, changing enhanced) scoring loop this
    halves that cost.

    Returns a cache pytree: {"xlp": [nsub, nchan] 2560 Hz envelope,
    "bwx": [nchan] signal bandwidths (the reference compensates BOTH ears'
    group delay with BWx, pyhaspi2.py:1238-1243, so the degraded side needs
    it)}.
    """
    x24 = _rms_normalize_one(x24, n_valid)
    xdb, bwx = _single_side_ear(x24, level1, n_valid)
    cfreq = center_freq(NCHAN)
    xdb = _tail_mask(group_delay_comp(xdb, bwx, cfreq), n_valid)
    return {"xlp": chains.env_filt_one(xdb, 320.0, 2560.0), "bwx": bwx}


@functools.partial(jax.jit, static_argnames=("level1", "noise_scale"))
def haspi_v2_from_clean_24k(y24: jnp.ndarray, clean, level1: float = 65.0,
                            key: jax.Array | None = None,
                            noise_scale: float = 0.0,
                            n_valid: jnp.ndarray | None = None):
    """HASPI v2 of a degraded signal against a precomputed clean-side cache
    (haspi_v2_clean_24k).  Numerically matches haspi_v2_24k — the pair path
    has no cross-side coupling other than BWx, which the cache carries.
    Returns (score, aveCM[10])."""
    y24 = _rms_normalize_one(y24, n_valid)
    if key is None:
        key = jax.random.PRNGKey(0)
    _, k_cep = jax.random.split(key)
    ydb, _ = _single_side_ear(y24, level1, n_valid)
    cfreq = center_freq(NCHAN)
    ydb = _tail_mask(group_delay_comp(ydb, clean["bwx"], cfreq), n_valid)
    ylp = chains.env_filt_one(ydb, 320.0, 2560.0)
    xcep, ycep, count = chains.cep_coef(clean["xlp"], ylp, 2.5, 0.1, 6,
                                        key=k_cep, noise_scale=noise_scale)
    avecm = chains.mod_filt_corr(xcep, ycep, count, 2560.0)
    weights = jnp.asarray(HASPI_V2_WEIGHTS, y24.dtype)
    return jnp.sum(weights * avecm), avecm


@functools.partial(jax.jit, static_argnames=("level1", "noise_scale"))
def haspi_v1_24k(x24: jnp.ndarray, y24: jnp.ndarray, level1: float = 65.0,
                 key: jax.Array | None = None, noise_scale: float = 0.0,
                 n_valid: jnp.ndarray | None = None):
    """HASPI version 1 (reference haspi, pyhaspi2.py:109-157).
    Returns (intelligibility in [0,1], raw = [cepcorr, cov3...])."""
    x24, y24 = _rms_normalize(x24, y24, n_valid)
    if key is None:
        key = jax.random.PRNGKey(0)
    ear = ear_model(x24, y24, itype=0, level1=level1, key=key,
                    noise_scale=noise_scale, n_valid=n_valid)
    xsm = chains.env_smooth(ear.xdb, 16)
    ysm = chains.env_smooth(ear.ydb, 16)
    cepcorr, _ = chains.melcor(xsm, ysm, 2.5)
    sigcov, msx, _ = chains.bm_covary(ear.xbm, ear.ybm, 16)
    cov3 = chains.three_level_covary(sigcov, msx, 2.5)
    bias, wgtcep = -9.047, 14.816
    wgtcov = jnp.asarray([0.0, 0.0, 4.616], x24.dtype)
    arg = bias + wgtcep * cepcorr + jnp.sum(wgtcov * cov3)
    intel = 1.0 / (1.0 + jnp.exp(-arg))
    return intel, jnp.concatenate([cepcorr[None], cov3])


@functools.partial(jax.jit, static_argnames=("level1", "noise_scale"))
def hasqi_v2_24k(x24: jnp.ndarray, y24: jnp.ndarray, level1: float = 65.0,
                 key: jax.Array | None = None, noise_scale: float = 0.0,
                 n_valid: jnp.ndarray | None = None):
    """HASQI version 2 quality (reference hasqi_v2, pyhaspi2.py:32-74).
    Returns (combined, nonlin, linear, raw[4])."""
    x24, y24 = _rms_normalize(x24, y24, n_valid)
    if key is None:
        key = jax.random.PRNGKey(0)
    ear = ear_model(x24, y24, itype=2, level1=level1, key=key,
                    noise_scale=noise_scale, n_valid=n_valid)
    xsm = chains.env_smooth(ear.xdb, 16)
    ysm = chains.env_smooth(ear.ydb, 16)
    cepcorr, _ = chains.melcor(xsm, ysm, 2.5)
    dloud, _, dslope = chains.spect_diff(ear.xsl, ear.ysl)
    sigcov, msx, _ = chains.bm_covary(ear.xbm, ear.ybm, 16)
    _, syncov = chains.ave_covary2(sigcov, msx, 2.5, center_freq())
    bmsync5 = syncov[4]

    dl = jnp.clip(1.0 - dloud[1] / 2.5, 0.0, 1.0)
    ds = jnp.clip(1.0 - dslope[1], 0.0, 1.0)
    nonlin = cepcorr * cepcorr * bmsync5
    linear = 0.579 * dl + 0.421 * ds
    combined = nonlin * linear
    return combined, nonlin, linear, jnp.stack([cepcorr, bmsync5, dl, ds])


def haspi_v2(x, fs_x, y, fs_y, **kw):
    """16 kHz-friendly wrapper matching the reference signature."""
    n = min(x.shape[-1], y.shape[-1])
    x24 = resample_to_24k(jnp.asarray(x)[..., :n], fs_x)
    y24 = resample_to_24k(jnp.asarray(y)[..., :n], fs_y)
    return haspi_v2_24k(x24, y24, **kw)


def haspi_v1(x, fs_x, y, fs_y, **kw):
    n = min(x.shape[-1], y.shape[-1])
    x24 = resample_to_24k(jnp.asarray(x)[..., :n], fs_x)
    y24 = resample_to_24k(jnp.asarray(y)[..., :n], fs_y)
    return haspi_v1_24k(x24, y24, **kw)


def hasqi_v2(x, fs_x, y, fs_y, **kw):
    n = min(x.shape[-1], y.shape[-1])
    x24 = resample_to_24k(jnp.asarray(x)[..., :n], fs_x)
    y24 = resample_to_24k(jnp.asarray(y)[..., :n], fs_y)
    return hasqi_v2_24k(x24, y24, **kw)
