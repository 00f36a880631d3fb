"""Jitted multi-metric GAN training steps.

Re-architecture of the reference's per-utterance torch loops
(reference: train_nele.py:122-156 G step, :342-426 D steps): each step here
is one XLA program over a *bucketed batch* of utterances — featurization
(STFT + IMCRA scan), generator forward, energy normalisation, discriminator
forward, loss, and optimiser update all fused under a single jit.  Exact
reference semantics:

  * G loss = MSE(D(enh, noise, clean), 1) + 0.5 * MSE(D_Qua(enh, clean), 1)
    (train_nele.py:152, weight_qua=0.5);
  * beta^2 utterance-level energy normalisation (train_nele.py:133-138);
  * the discriminators run in train mode during the G step, so their
    spectral-norm power iterations advance (torch modules stay in train());
  * D and D_Qua train with separate Adam optimisers (train_nele.py:89-91).

Padded frames are masked exactly: the generator is causal (padding cannot
leak backwards), the band images are zeroed past each utterance's frame
count, and the discriminators' global pool excludes every conv output whose
receptive field touches padding.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from nelegan_tpu.config import Config
from nelegan_tpu.models.generator import Generator
from nelegan_tpu.models.discriminator import (IntelDiscriminator,
                                              QualityDiscriminator)
from nelegan_tpu.pipeline import (BatchFeatures, frame_mask,
                                  beta2_energy_norm, featurize_batch)
from nelegan_tpu.dsp.stft import stft
from nelegan_tpu.dsp.erb import band_energy


class TrainState(NamedTuple):
    gen_params: Any
    gen_opt: Any
    d_params: Any
    d_spectral: Any
    d_opt: Any
    dq_params: Any
    dq_spectral: Any
    dq_opt: Any
    step_g: jnp.ndarray
    step_d: jnp.ndarray


def _optims(cfg: Config):
    return (optax.adam(cfg.train.lr_g), optax.adam(cfg.train.lr_d),
            optax.adam(cfg.train.lr_dqua))


def init_train_state(key: jax.Array, cfg: Config = Config(),
                     gen_params: Any = None) -> TrainState:
    kg, kd, kq = jax.random.split(key, 3)
    nb = cfg.model.n_bands
    dummy_band = jnp.zeros((1, 40, nb), jnp.float32)
    # image channels: 3 = (enhanced, noise, clean), 2 = (enhanced, clean)
    dummy_img3 = jnp.zeros((1, nb, 40, 3), jnp.float32)
    dummy_img2 = jnp.zeros((1, nb, 40, 2), jnp.float32)

    if gen_params is None:
        gen_params = Generator.from_config(cfg.model).init(
            kg, dummy_band, dummy_band)["params"]
    d_vars = IntelDiscriminator.from_config(cfg.model).init(kd, dummy_img3)
    dq_vars = QualityDiscriminator.from_config(cfg.model).init(kq, dummy_img2)

    opt_g, opt_d, opt_dq = _optims(cfg)
    return TrainState(
        gen_params=gen_params,
        gen_opt=opt_g.init(gen_params),
        d_params=d_vars["params"],
        d_spectral=d_vars["spectral"],
        d_opt=opt_d.init(d_vars["params"]),
        dq_params=dq_vars["params"],
        dq_spectral=dq_vars["spectral"],
        dq_opt=opt_dq.init(dq_vars["params"]),
        step_g=jnp.zeros((), jnp.int32),
        step_d=jnp.zeros((), jnp.int32),
    )


def _band_images(enh, noise, clean, fmask):
    """[B, T, 64] bands -> zero-padded [B, 64, T, C] discriminator images."""
    def img(b):
        return (b * fmask[..., None]).transpose(0, 2, 1)
    stacked3 = jnp.stack([img(enh), img(noise), img(clean)], axis=-1)
    stacked2 = jnp.stack([img(enh), img(clean)], axis=-1)
    return stacked3, stacked2


def _col_weights(cols, n, dtype):
    """Static per-column loss weights normalised to mean 1 over active
    columns (None -> all active).  A metric column that is not being scored
    must contribute NO loss: its targets would be fabricated constants and
    G/D would fight over a dead output (the head-gating rationale, applied
    per column)."""
    if cols is None:
        return jnp.ones((n,), dtype)
    w = jnp.asarray(cols, dtype)
    return w * (n / jnp.maximum(jnp.sum(w), 1.0))


@functools.partial(jax.jit, static_argnames=("cfg", "intel_cols",
                                             "quality_cols"))
def g_step_bands(state: TrainState, clean_band, noise_band, frames,
                 cfg: Config = Config(), intel_cols: tuple = None,
                 quality_cols: tuple = None, row_valid=None):
    """One generator update from precomputed band features.

    Band features are deterministic per (utterance, bucket length), so the
    training loop caches them across epochs — the reference recomputed the
    full featurization in every DataLoader __getitem__ (dataloader.py:30-42).
    intel_cols / quality_cols: static 0/1 tuples selecting which score
    columns carry loss (None = all) — columns of unscored metrics are
    excluded on BOTH G and D sides.  row_valid (traced [B] 0/1, optional):
    ragged batches are shape-padded by repeating rows (train/loop.py); the
    mask zeroes the padded rows' loss so padding cannot reweight gradients.
    Returns (state, loss).
    """
    p = cfg.train.p_power
    t = clean_band.shape[1]
    fmask = frame_mask(frames, t).astype(clean_band.dtype)
    target = jnp.ones((clean_band.shape[0], cfg.model.n_intel_scores),
                      clean_band.dtype)
    target_q = jnp.ones((clean_band.shape[0], cfg.model.n_quality_scores),
                        clean_band.dtype)
    wi = _col_weights(intel_cols, cfg.model.n_intel_scores, clean_band.dtype)
    wq = _col_weights(quality_cols, cfg.model.n_quality_scores,
                      clean_band.dtype)
    rv = (jnp.ones((clean_band.shape[0],), clean_band.dtype)
          if row_valid is None
          else jnp.asarray(row_valid, clean_band.dtype))
    rden = jnp.maximum(jnp.sum(rv), 1.0)

    def loss_fn(gen_params):
        mask = Generator.from_config(cfg.model).apply(
            {"params": gen_params}, clean_band, noise_band)
        beta2 = beta2_energy_norm(clean_band, mask, fmask,
                                  inv_p=cfg.train.inv_p)
        beta_p = beta2 ** p
        enh_band = clean_band * (mask ** p) * beta_p
        ref_band = jax.lax.stop_gradient(clean_band)

        img3, img2 = _band_images(enh_band, noise_band, ref_band, fmask)
        score, d_spec = IntelDiscriminator.from_config(cfg.model).apply(
            {"params": state.d_params, "spectral": state.d_spectral},
            img3, frames, update_sn=True, mutable=["spectral"])
        score_q, dq_spec = QualityDiscriminator.from_config(cfg.model).apply(
            {"params": state.dq_params, "spectral": state.dq_spectral},
            img2, frames, update_sn=True, mutable=["spectral"])
        # row-masked means: identical to jnp.mean when every row is valid
        loss = (jnp.sum(rv[:, None] * wi * (score - target) ** 2)
                / (rden * score.shape[-1])
                + cfg.train.weight_qua
                * jnp.sum(rv[:, None] * wq * (score_q - target_q) ** 2)
                / (rden * score_q.shape[-1]))
        return loss, (d_spec["spectral"], dq_spec["spectral"])

    (loss, (d_spec, dq_spec)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.gen_params)
    opt_g, _, _ = _optims(cfg)
    updates, gen_opt = opt_g.update(grads, state.gen_opt, state.gen_params)
    gen_params = optax.apply_updates(state.gen_params, updates)
    return state._replace(gen_params=gen_params, gen_opt=gen_opt,
                          d_spectral=d_spec, dq_spectral=dq_spec,
                          step_g=state.step_g + 1), loss


def g_step(state: TrainState, feats: BatchFeatures,
           cfg: Config = Config(), intel_cols: tuple = None,
           quality_cols: tuple = None, row_valid=None):
    """BatchFeatures convenience wrapper around g_step_bands."""
    return g_step_bands(state, feats.clean_band, feats.noise_band,
                        feats.frames, cfg, intel_cols, quality_cols,
                        row_valid)


@functools.partial(jax.jit, static_argnames=("cfg",))
def featurize_bands(clean_padded, noise_padded, lengths,
                    cfg: Config = Config()):
    """(clean_band, noise_band, frames) for the band cache."""
    feats = featurize_batch(clean_padded, noise_padded, lengths,
                            cfg.train.p_power)
    return feats.clean_band, feats.noise_band, feats.frames


@functools.partial(jax.jit, static_argnames=("cfg",))
def speech_band(wav_padded, cfg: Config = Config()):
    """Band features of a reflect-prepadded speech batch (no IMCRA)."""
    spec = stft(wav_padded, center=False)
    return band_energy(jnp.abs(jnp.swapaxes(spec, -1, -2))) ** \
        cfg.train.p_power


@functools.partial(jax.jit, static_argnames=("cfg",))
def eband_from_enhanced(wav, out_lens, cfg: Config = Config()):
    """Enhanced-wav band features straight from enhance_batch's device
    output: PCM16-quantize (bit-exact vs the written file,
    pipeline.pcm16_quantize), ragged reflect-pad, STFT bands.  The
    enhance-for-D phase inserts these rows into the device band pool, so
    even D pass 1 never reads the file it just wrote."""
    from nelegan_tpu.pipeline import pcm16_quantize, reflect_pad_device
    padded = reflect_pad_device(pcm16_quantize(wav), out_lens)
    return speech_band(padded, cfg)


@jax.jit
def d_images(eband, noise_band, clean_band, frames):
    """Assemble the discriminator image tensors from band features."""
    t = eband.shape[1]
    fmask = frame_mask(frames, t).astype(eband.dtype)
    return _band_images(eband, noise_band, clean_band, fmask)


@functools.partial(jax.jit, static_argnames=("cfg",))
def featurize_triple(enh_padded, noise_padded, clean_padded, lengths,
                     cfg: Config = Config()):
    """Featurize a (enhanced, noise, clean) wav triple batch into the
    discriminator image tensors (reference: dataloader.py:54-84).

    All inputs are reflect-prepadded [B, n + 512] buffers.
    """
    p = cfg.train.p_power
    feats = featurize_batch(clean_padded, noise_padded, lengths, p)
    eband = speech_band(enh_padded, cfg)
    t = eband.shape[1]
    fmask = frame_mask(feats.frames, t).astype(eband.dtype)
    img3, img2 = _band_images(eband, feats.noise_band, feats.clean_band,
                              fmask)
    return img3, img2, feats.frames


@functools.partial(jax.jit, static_argnames=("cfg", "update_intel",
                                             "update_quality", "intel_cols",
                                             "quality_cols"))
def d_step_enhanced(state: TrainState, enh_padded, noise_band, clean_band,
                    frames, targets, targets_q, cfg: Config = Config(),
                    update_intel: bool = True, update_quality: bool = True,
                    intel_cols: tuple = None, quality_cols: tuple = None,
                    row_valid=None):
    """Fused D update from an enhanced-wav batch + cached clean/noise bands:
    featurize + image assembly + both head updates in ONE device program
    (each separate dispatch costs a full round trip on remote devices)."""
    eband = speech_band(enh_padded, cfg)
    img3, img2 = d_images(eband, noise_band, clean_band, frames)
    return d_step(state, img3, img2, frames, targets, targets_q, cfg,
                  update_intel, update_quality, intel_cols, quality_cols,
                  row_valid)


@functools.partial(jax.jit, static_argnames=("cfg", "update_intel",
                                             "update_quality", "intel_cols",
                                             "quality_cols"))
def d_step_bands(state: TrainState, eband, noise_band, clean_band, frames,
                 targets, targets_q, cfg: Config = Config(),
                 update_intel: bool = True, update_quality: bool = True,
                 intel_cols: tuple = None, quality_cols: tuple = None,
                 row_valid=None):
    """D update from precomputed enhanced bands (the training loop's
    device-resident band pool, train/loop.py): identical math to
    d_step_enhanced, minus the featurization — the enhanced wav's bands are
    deterministic per file, so passes 2-3 of each epoch (and replayed
    entries in later epochs) gather cached rows on device instead of
    re-reading the PCM16 file, re-uploading it through the tunnel, and
    re-running the STFT."""
    img3, img2 = d_images(eband, noise_band, clean_band, frames)
    return d_step(state, img3, img2, frames, targets, targets_q, cfg,
                  update_intel, update_quality, intel_cols, quality_cols,
                  row_valid)


@functools.partial(jax.jit, static_argnames=("cfg", "update_intel",
                                             "update_quality", "intel_cols",
                                             "quality_cols"))
def d_steps_scan(state: TrainState, eband, clean_band, noise_band, frames,
                 targets, targets_q, row_valid, group_valid,
                 cfg: Config = Config(), update_intel: bool = True,
                 update_quality: bool = True, intel_cols: tuple = None,
                 quality_cols: tuple = None):
    """lax.scan of sequential D updates over G same-bucket groups in ONE
    compiled program.

    The per-step path (d_step_bands) costs ~3 device dispatches per
    group through the remote-device tunnel (two pool gathers + the
    step) — ~700 dispatches per epoch at the reference's 300-utterance
    scale.  The scanned pass batch-gathers each chunk's pool rows
    outside (one gather per pool) and replaces G step dispatches with
    one; the updates stay strictly sequential (the optimizer state
    threads through the scan carry), so the math is the per-step
    path's exactly.  Band inputs arrive flat ([G*B, ...], straight
    from the chunk gather) and are reshaped here so the program's
    shapes depend only on (bucket_len, G, B) — never on the pool
    capacity, which grows geometrically and would recompile this
    program at every step of that growth (remote compiles cost
    30-240 s each under service load).

    targets [G, B, 3]; targets_q [G, B, 2]; row_valid [G, B];
    group_valid [G] bool — False groups are pure shape padding:
    lax.cond skips their compute and leaves state (step_d included)
    untouched.  Returns (state, losses [G, 2] f32)."""
    g, b = targets.shape[:2]

    def chunked(a):
        return a.reshape((g, b) + a.shape[1:])

    xs = (chunked(eband), chunked(clean_band), chunked(noise_band),
          chunked(frames), targets, targets_q, row_valid, group_valid)

    def body(st, inp):
        eb, cb, nb, fr, tg, tq, rv, gv = inp

        def do(st):
            st2, ld, lq = d_step_bands(
                st, eb, nb, cb, fr, tg, tq, cfg, update_intel,
                update_quality, intel_cols, quality_cols, rv)
            return st2, jnp.stack([ld.astype(jnp.float32),
                                   lq.astype(jnp.float32)])

        def skip(st):
            return st, jnp.zeros((2,), jnp.float32)

        return jax.lax.cond(gv, do, skip, st)

    return jax.lax.scan(body, state, xs)


@functools.partial(jax.jit, static_argnames=("cfg", "update_intel",
                                             "update_quality", "intel_cols",
                                             "quality_cols"))
def d_step(state: TrainState, img3, img2, frames, targets, targets_q,
           cfg: Config = Config(), update_intel: bool = True,
           update_quality: bool = True, intel_cols: tuple = None,
           quality_cols: tuple = None, row_valid=None):
    """One discriminator update (both heads, separate optimisers).
    Returns (state, loss_d, loss_dq).  A head whose metrics are not being
    scored trains toward fabricated targets and distorts the generator, so
    the training loop disables it via the update_* flags; within an active
    head, intel_cols / quality_cols (static 0/1 tuples) exclude individual
    unscored metric columns from the loss the same way.  row_valid (traced
    [B] 0/1): zero loss weight for shape-padding rows."""
    wi = _col_weights(intel_cols, targets.shape[-1], img3.dtype)
    wq = _col_weights(quality_cols, targets_q.shape[-1], img3.dtype)
    rv = (jnp.ones((img3.shape[0],), img3.dtype) if row_valid is None
          else jnp.asarray(row_valid, img3.dtype))
    rden = jnp.maximum(jnp.sum(rv), 1.0)

    def loss_d_fn(d_params):
        score, d_spec = IntelDiscriminator.from_config(cfg.model).apply(
            {"params": d_params, "spectral": state.d_spectral},
            img3, frames, update_sn=True, mutable=["spectral"])
        loss = jnp.sum(rv[:, None] * wi * (score - targets) ** 2) \
            / (rden * score.shape[-1])
        return loss, d_spec["spectral"]

    def loss_dq_fn(dq_params):
        score, dq_spec = QualityDiscriminator.from_config(cfg.model).apply(
            {"params": dq_params, "spectral": state.dq_spectral},
            img2, frames, update_sn=True, mutable=["spectral"])
        loss = jnp.sum(rv[:, None] * wq * (score - targets_q) ** 2) \
            / (rden * score.shape[-1])
        return loss, dq_spec["spectral"]

    _, opt_d, opt_dq = _optims(cfg)
    d_params, d_spec, d_opt = state.d_params, state.d_spectral, state.d_opt
    dq_params, dq_spec, dq_opt = (state.dq_params, state.dq_spectral,
                                  state.dq_opt)
    loss_d = jnp.zeros((), img3.dtype)
    loss_dq = jnp.zeros((), img3.dtype)
    if update_intel:
        (loss_d, d_spec), gd = jax.value_and_grad(
            loss_d_fn, has_aux=True)(state.d_params)
        upd_d, d_opt = opt_d.update(gd, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, upd_d)
    if update_quality:
        (loss_dq, dq_spec), gq = jax.value_and_grad(
            loss_dq_fn, has_aux=True)(state.dq_params)
        upd_q, dq_opt = opt_dq.update(gq, state.dq_opt, state.dq_params)
        dq_params = optax.apply_updates(state.dq_params, upd_q)
    return state._replace(
        d_params=d_params, d_spectral=d_spec, d_opt=d_opt,
        dq_params=dq_params, dq_spectral=dq_spec, dq_opt=dq_opt,
        step_d=state.step_d + 1), loss_d, loss_dq
