"""Discriminator head gating: an unscored head stays frozen."""
import numpy as np
import jax

from nelegan_tpu.config import Config
from nelegan_tpu.train import gan
from nelegan_tpu import pipeline


def test_quality_head_frozen_when_gated():
    cfg = Config()
    rng = np.random.RandomState(0)
    wavs = [(0.03 * rng.randn(12288)).astype(np.float32) for _ in range(2)]
    cp, lens = pipeline.reflect_pad_batch(wavs)
    npd, _ = pipeline.reflect_pad_batch(
        [(0.03 * rng.randn(12288)).astype(np.float32) for _ in range(2)])
    state = gan.init_train_state(jax.random.PRNGKey(0), cfg)
    img3, img2, frames = gan.featurize_triple(cp, npd, cp, lens, cfg)
    t3 = np.full((2, 3), 0.7, np.float32)
    t2 = np.full((2, 2), 0.7, np.float32)

    before_q = jax.tree.map(np.asarray, state.dq_params)
    before_d = jax.tree.map(np.asarray, state.d_params)
    state2, ld, lq = gan.d_step(state, img3, img2, frames, t3, t2, cfg,
                                update_intel=True, update_quality=False)
    assert float(ld) > 0 and float(lq) == 0.0
    # quality head untouched, intel head moved
    for a, b in zip(jax.tree.leaves(before_q),
                    jax.tree.leaves(jax.tree.map(np.asarray,
                                                 state2.dq_params))):
        np.testing.assert_array_equal(a, b)
    moved = any(np.abs(a - b).max() > 0
                for a, b in zip(jax.tree.leaves(before_d),
                                jax.tree.leaves(jax.tree.map(
                                    np.asarray, state2.d_params))))
    assert moved


def test_per_column_gating_excludes_unscored_metrics():
    """intel_cols masks individual metric columns: the loss must ignore
    unscored columns entirely, and gradients must not chase their
    fabricated 0.5 targets."""
    cfg = Config()
    rng = np.random.RandomState(1)
    wavs = [(0.03 * rng.randn(12288)).astype(np.float32) for _ in range(2)]
    cp, lens = pipeline.reflect_pad_batch(wavs)
    npd, _ = pipeline.reflect_pad_batch(
        [(0.03 * rng.randn(12288)).astype(np.float32) for _ in range(2)])
    state = gan.init_train_state(jax.random.PRNGKey(0), cfg)
    img3, img2, frames = gan.featurize_triple(cp, npd, cp, lens, cfg)
    # estoi-only intel set: siib/haspi columns carry fabricated 0.5s
    t3 = np.array([[0.5, 0.5, 0.9], [0.5, 0.5, 0.8]], np.float32)
    t2 = np.full((2, 2), 0.7, np.float32)

    _, ld_all, _ = gan.d_step(state, img3, img2, frames, t3, t2, cfg)
    _, ld_col, _ = gan.d_step(state, img3, img2, frames, t3, t2, cfg,
                              intel_cols=(0, 0, 1))
    # masked loss = mean over the active column only (weights are
    # normalised to mean 1 over active columns)
    score = np.asarray(gan.IntelDiscriminator.from_config(cfg.model).apply(
        {"params": state.d_params, "spectral": state.d_spectral},
        img3, frames, update_sn=True, mutable=["spectral"])[0])
    expect = np.mean((score[:, 2] - t3[:, 2]) ** 2)
    assert abs(float(ld_col) - expect) < 1e-5
    assert abs(float(ld_all) - float(ld_col)) > 1e-7  # gating changed loss

    # generator side: masked G loss must differ from unmasked when the
    # dead columns disagree with the all-ones target
    clean_band, noise_band, fr = gan.featurize_bands(cp, npd, lens, cfg)
    _, gl_all = gan.g_step_bands(state, clean_band, noise_band, fr, cfg)
    _, gl_col = gan.g_step_bands(state, clean_band, noise_band, fr, cfg,
                                 intel_cols=(0, 0, 1),
                                 quality_cols=(1, 1))
    assert abs(float(gl_all) - float(gl_col)) > 1e-7
