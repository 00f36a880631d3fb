"""Direct differentiable-metric optimisation.

The reference can only optimise metrics through the MetricGAN surrogate:
true scores come from CPU processes/C++ binaries, so gradients stop at the
discriminator (SURVEY §2 L0).  In this framework the intelligibility metrics
are JAX functions end to end, so the generator can take gradients *through
the metric itself* — enhancement -> resynthesis -> ESTOI/HASPI — a training
mode the reference architecture cannot express.

`direct_g_step` maximises masked-batch differentiable ESTOI (optionally plus
HASPI v2) of (clean, enhanced + noise).  It composes with the GAN loop as a
regulariser or standalone.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from nelegan_tpu.config import Config
from nelegan_tpu.models.generator import Generator
from nelegan_tpu.pipeline import (BatchFeatures, frame_mask,
                                  beta2_energy_norm,
                                  istft_batch_tail_truncated, HOP)
from nelegan_tpu.dsp.erb import interp_band_gain
from nelegan_tpu.dsp.resample import resample_poly
from nelegan_tpu.metrics.estoi import estoi_10k
from nelegan_tpu.metrics.haspi import haspi_v2_24k, resample_to_24k


def _enhance_wavs(gen_params, feats: BatchFeatures, cfg: Config):
    """Differentiable band-domain enhancement -> waveforms [B, n]."""
    p = cfg.train.p_power
    t = feats.clean_band.shape[1]
    fmask = frame_mask(feats.frames, t).astype(feats.clean_band.dtype)
    mask = Generator.from_config(cfg.model).apply(
        {"params": gen_params}, feats.clean_band, feats.noise_band)
    beta2 = beta2_energy_norm(feats.clean_band, mask, fmask,
                              inv_p=cfg.train.inv_p)
    alpha2 = mask * beta2
    gain = jnp.sqrt(interp_band_gain(alpha2))
    spec = (feats.clean_mag * jnp.exp(1j * feats.clean_phase)
            * jnp.swapaxes(gain, -1, -2))
    wav = istft_batch_tail_truncated(spec, feats.frames)
    out_len = HOP * (feats.frames - 1)
    rms = jnp.sqrt(jnp.sum(wav * wav, -1)
                   / jnp.maximum(out_len, 1).astype(wav.dtype))
    return wav / rms[:, None] * cfg.train.target_rms, out_len


def direct_metric_loss(gen_params, feats: BatchFeatures,
                       clean_wavs: jnp.ndarray, noise_wavs: jnp.ndarray,
                       cfg: Config = Config(),
                       haspi_weight: float = 0.0,
                       pesq_weight: float = 0.0) -> jnp.ndarray:
    """-mean differentiable metric of (clean, enhanced + noise).

    clean_wavs/noise_wavs: unpadded-layout [B, n] buffers (zero tails),
    aligned with feats.  Returns a scalar loss.  `pesq_weight` adds the
    differentiable P.862 quality term on (clean, enhanced) — the quality
    metrics hear the enhanced signal without noise (reference intel.py
    wrapper semantics) — balancing intelligibility against the spectral
    distortion the NELE re-EQ introduces.
    """
    enh, out_len = _enhance_wavs(gen_params, feats, cfg)
    n = min(enh.shape[-1], clean_wavs.shape[-1])
    noisy = enh[:, :n] + noise_wavs[:, :n]
    ref = clean_wavs[:, :n]

    ref10 = resample_poly(ref, 5, 8)
    noisy10 = resample_poly(noisy, 5, 8)
    nv10 = -(-out_len * 5 // 8)
    est = jax.vmap(estoi_10k)(ref10, noisy10, nv10)
    loss = -jnp.mean(est)

    if haspi_weight > 0.0:
        ref24 = resample_to_24k(ref, 16000)
        noisy24 = resample_to_24k(noisy, 16000)
        nv24 = -(-out_len * 3 // 2)
        hasp = jax.vmap(lambda a, b, v: haspi_v2_24k(a, b, n_valid=v)[0])(
            ref24, noisy24, nv24)
        loss = loss - haspi_weight * jnp.mean(hasp)

    if pesq_weight > 0.0:
        from nelegan_tpu.metrics.pesq import pesq_p862_16k
        pq = jax.vmap(pesq_p862_16k)(ref, enh[:, :n], out_len)
        # scale raw PESQ ([-0.5, 4.5]) to the unit metric range
        loss = loss - pesq_weight * jnp.mean((pq - 1.0) / 3.5)
    return loss


@functools.partial(jax.jit, static_argnames=("cfg", "haspi_weight",
                                             "pesq_weight", "lr"))
def direct_g_step(gen_params, opt_state, feats: BatchFeatures,
                  clean_wavs, noise_wavs, cfg: Config = Config(),
                  haspi_weight: float = 0.0, pesq_weight: float = 0.0,
                  lr: float = 5e-4):
    """One direct-metric gradient step on the generator.
    Returns (gen_params, opt_state, loss)."""
    loss, grads = jax.value_and_grad(direct_metric_loss)(
        gen_params, feats, clean_wavs, noise_wavs, cfg, haspi_weight,
        pesq_weight)
    opt = optax.adam(lr)
    updates, opt_state = opt.update(grads, opt_state, gen_params)
    return optax.apply_updates(gen_params, updates), opt_state, loss
