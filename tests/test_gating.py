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
