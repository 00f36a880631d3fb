"""Multi-device data/tensor parallelism: sharded steps match single-device."""
import numpy as np
import jax
import pytest

from nelegan_tpu.config import Config
from nelegan_tpu.parallel.mesh import (make_mesh, shard_batch, shard_params,
                                       replicate)
from nelegan_tpu.train import gan
from nelegan_tpu import pipeline


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    b, n = 8, 8192
    clean, lens = pipeline.reflect_pad_batch(
        [(0.03 * rng.randn(n)).astype(np.float32) for _ in range(b)])
    noise, _ = pipeline.reflect_pad_batch(
        [(0.03 * rng.randn(n)).astype(np.float32) for _ in range(b)])
    return clean, noise, lens


def test_dp_g_step_matches_single(batch):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    clean, noise, lens = batch
    cfg = Config()
    cb, nb, fr = gan.featurize_bands(clean, noise, lens, cfg)
    cb, nb, fr = map(np.asarray, (cb, nb, fr))

    state0 = gan.init_train_state(jax.random.PRNGKey(0), cfg)
    _, loss_single = gan.g_step_bands(state0, cb, nb, fr, cfg)

    mesh = make_mesh(8, model_parallel=1)
    state_r = replicate(mesh, state0)
    cb_s, nb_s, fr_s = shard_batch(mesh, (cb, nb, fr))
    state1, loss_dp = gan.g_step_bands(state_r, cb_s, nb_s, fr_s, cfg)
    np.testing.assert_allclose(float(loss_dp), float(loss_single),
                               rtol=1e-5)
    # the sharded update equals the single-device update
    w0 = np.asarray(gan.g_step_bands(state0, cb, nb, fr,
                                     cfg)[0].gen_params["fc1"]["kernel"])
    w1 = np.asarray(state1.gen_params["fc1"]["kernel"])
    np.testing.assert_allclose(w1, w0, rtol=1e-4, atol=1e-6)


def test_dp_tp_d_step(batch):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    clean, noise, lens = batch
    cfg = Config()
    img3, img2, frames = gan.featurize_triple(clean, noise, clean, lens, cfg)
    img3, img2, frames = map(np.asarray, (img3, img2, frames))
    t3 = np.full((8, 3), 0.7, np.float32)
    t2 = np.full((8, 2), 0.7, np.float32)

    state0 = gan.init_train_state(jax.random.PRNGKey(0), cfg)
    _, ld0, lq0 = gan.d_step(state0, img3, img2, frames, t3, t2, cfg)

    mesh = make_mesh(8, model_parallel=2)
    state_r = state0._replace(
        d_params=shard_params(mesh, state0.d_params),
        d_opt=shard_params(mesh, state0.d_opt),
        dq_params=shard_params(mesh, state0.dq_params),
        dq_opt=shard_params(mesh, state0.dq_opt),
        gen_params=replicate(mesh, state0.gen_params),
        gen_opt=replicate(mesh, state0.gen_opt),
        d_spectral=replicate(mesh, state0.d_spectral),
        dq_spectral=replicate(mesh, state0.dq_spectral))
    args_s = shard_batch(mesh, (img3, img2, frames, t3, t2))
    _, ld1, lq1 = gan.d_step(state_r, *args_s, cfg)
    np.testing.assert_allclose(float(ld1), float(ld0), rtol=1e-5)
    np.testing.assert_allclose(float(lq1), float(lq0), rtol=1e-5)
