"""Smoke tier: one generator update + one discriminator update.

The full training-loop tests (tests/test_train.py) run multi-epoch Trainer
epochs with metric scoring — minutes on a 1-core host.  This exercises the
same jitted step programs (train/gan.py g_step_bands / d_step_bands, the
reference's per-batch updates in train_nele.py:152-231) on tiny shapes so
the smoke tier covers the training layer in seconds.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nelegan_tpu.config import Config, ModelConfig
from nelegan_tpu.train import gan


@pytest.mark.smoke
def test_one_g_and_d_step():
    # Production-shaped but small: same programs, fast 1-core compiles.
    cfg = Config(model=ModelConfig(gen_hidden=32, gen_blocks=2,
                                   disc_channels=(4, 8),
                                   disc_kernels=(1, 3)))
    state = gan.init_train_state(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    b, t, nb = 2, 40, cfg.model.n_bands
    clean_band = jnp.asarray(rng.rand(b, t, nb).astype(np.float32) ** 2)
    noise_band = jnp.asarray(rng.rand(b, t, nb).astype(np.float32) ** 2)
    eband = jnp.asarray(rng.rand(b, t, nb).astype(np.float32) ** 2)
    frames = jnp.asarray([t, t - 5], jnp.int32)

    g0 = np.asarray(state.gen_params["fc1"]["kernel"])
    state, loss_g = gan.g_step_bands(state, clean_band, noise_band, frames,
                                     cfg)
    assert np.isfinite(float(loss_g))
    assert np.abs(np.asarray(state.gen_params["fc1"]["kernel"]) - g0).max() \
        > 0

    targets = jnp.full((b, cfg.model.n_intel_scores), 0.5, jnp.float32)
    targets_q = jnp.full((b, cfg.model.n_quality_scores), 0.5, jnp.float32)
    step_d0 = int(state.step_d)
    state, loss_d, loss_dq = gan.d_step_bands(
        state, eband, noise_band, clean_band, frames, targets, targets_q,
        cfg)
    assert np.isfinite(float(loss_d)) and np.isfinite(float(loss_dq))
    assert int(state.step_d) == step_d0 + 1
