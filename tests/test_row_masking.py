"""Losses must be invariant to shape-padding row count (VERDICT r1 #9).

Ragged batches are padded by repeating rows so every epoch reuses one
compiled (batch, bucket) program; the row_valid masks in
gan.g_step_bands / gan.d_step must make those padded rows carry ZERO loss
weight — a 2-real-row batch padded to 8 scores identically to the
unpadded 2-row batch."""
import numpy as np
import pytest

import jax

from nelegan_tpu.config import Config
from nelegan_tpu import pipeline
from nelegan_tpu.train import gan


@pytest.fixture(scope="module")
def setup():
    cfg = Config()
    rng = np.random.RandomState(0)
    n = 8192
    wavs = [0.03 * rng.randn(n).astype(np.float32) for _ in range(2)]
    noises = [0.03 * rng.randn(n).astype(np.float32) for _ in range(2)]
    clean, lengths = pipeline.reflect_pad_batch(wavs)
    noise, _ = pipeline.reflect_pad_batch(noises)
    cb, nb, fr = (np.asarray(a) for a in
                  gan.featurize_bands(clean, noise, lengths, cfg))
    state = gan.init_train_state(jax.random.PRNGKey(0), cfg)
    return cfg, state, clean, cb, nb, fr


def _pad(a, total):
    reps = np.repeat(a[-1:], total - a.shape[0], axis=0)
    return np.concatenate([a, reps], axis=0)


def test_g_loss_invariant_to_padding(setup):
    cfg, state, _, cb, nb, fr = setup
    _, loss_plain = gan.g_step_bands(state, cb, nb, fr, cfg)

    total = 8
    mask = (np.arange(total) < 2).astype(np.float32)
    _, loss_padded = gan.g_step_bands(
        state, _pad(cb, total), _pad(nb, total), _pad(fr, total), cfg,
        row_valid=mask)
    assert abs(float(loss_plain) - float(loss_padded)) < 1e-6

    # and WITHOUT the mask the padded batch must differ (the old bug)
    _, loss_nomask = gan.g_step_bands(
        state, _pad(cb, total), _pad(nb, total), _pad(fr, total), cfg)
    assert abs(float(loss_plain) - float(loss_nomask)) > 1e-7


def test_d_losses_invariant_to_padding(setup):
    cfg, state, clean, cb, nb, fr = setup
    img3, img2 = (np.asarray(a) for a in gan.d_images(cb, nb, cb, fr))
    rng = np.random.RandomState(1)
    tg = rng.rand(2, 3).astype(np.float32)
    tq = rng.rand(2, 2).astype(np.float32)
    _, ld0, lq0 = gan.d_step(state, img3, img2, fr, tg, tq, cfg)

    total = 8
    mask = (np.arange(total) < 2).astype(np.float32)
    _, ld1, lq1 = gan.d_step(
        state, _pad(img3, total), _pad(img2, total), _pad(fr, total),
        _pad(tg, total), _pad(tq, total), cfg, row_valid=mask)
    assert abs(float(ld0) - float(ld1)) < 1e-6
    assert abs(float(lq0) - float(lq1)) < 1e-6


def test_gradients_invariant_to_padding(setup):
    """Not just the reported loss: the parameter UPDATE must match."""
    cfg, state, _, cb, nb, fr = setup
    s_plain, _ = gan.g_step_bands(state, cb, nb, fr, cfg)

    total = 8
    mask = (np.arange(total) < 2).astype(np.float32)
    s_pad, _ = gan.g_step_bands(
        state, _pad(cb, total), _pad(nb, total), _pad(fr, total), cfg,
        row_valid=mask)
    a = np.asarray(s_plain.gen_params["fc1"]["kernel"])
    b = np.asarray(s_pad.gen_params["fc1"]["kernel"])
    np.testing.assert_allclose(a, b, atol=2e-6)
