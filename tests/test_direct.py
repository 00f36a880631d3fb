"""Direct differentiable-metric optimisation: gradients flow through
ESTOI into the generator and a few steps improve the true metric."""
import numpy as np
import jax
import optax
import pytest
import scipy.io.wavfile as wavfile

from nelegan_tpu.config import Config
from nelegan_tpu import pipeline
from nelegan_tpu.models.generator import Generator
from nelegan_tpu.train.direct import direct_metric_loss, direct_g_step
from nelegan_tpu.metrics import estoi


@pytest.fixture(scope="module")
def setup():
    _, c = wavfile.read(
        "/root/reference/toy_dataset/Train/Clean/f_hvd_100#Babble#-11.wav")
    _, n = wavfile.read(
        "/root/reference/toy_dataset/Train/Noise/f_hvd_100#Babble#-11.wav")
    clean = (c / 32768.0).astype(np.float32)[:24576]
    noise = (n / 32768.0).astype(np.float32)[:24576]
    cp, lens = pipeline.reflect_pad_batch([clean, clean])
    npd, _ = pipeline.reflect_pad_batch([noise, noise])
    feats = pipeline.featurize_batch(cp, npd, lens)
    cfg = Config()
    params = Generator().init(jax.random.PRNGKey(0),
                              np.zeros((1, 8, 64), np.float32),
                              np.zeros((1, 8, 64), np.float32))["params"]
    wavs_c = np.stack([clean, clean])
    wavs_n = np.stack([noise, noise])
    return cfg, params, feats, wavs_c, wavs_n, clean, noise


def test_gradients_flow(setup):
    cfg, params, feats, wavs_c, wavs_n, *_ = setup
    grads = jax.grad(direct_metric_loss)(params, feats, wavs_c, wavs_n, cfg)
    norms = [float(np.abs(np.asarray(g)).max())
             for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert max(norms) > 1e-8  # gradient actually reaches the generator


def test_direct_steps_improve_estoi(setup):
    cfg, params, feats, wavs_c, wavs_n, clean, noise = setup
    opt_state = optax.adam(5e-4).init(params)
    loss0 = None
    for i in range(12):
        params, opt_state, loss = direct_g_step(
            params, opt_state, feats, wavs_c, wavs_n, cfg)
        if loss0 is None:
            loss0 = float(loss)
    # the differentiable objective improved
    assert float(loss) < loss0, (float(loss), loss0)
    # and the real (wrapper-level) metric improved over the initial params
    enh = np.asarray(pipeline.enhance_batch(params, feats)[0])[0]
    m = min(len(enh), len(clean))
    e_trained = float(estoi(clean[:m], enh[:m] + noise[:m], 16000))
    params0 = Generator().init(jax.random.PRNGKey(0),
                               np.zeros((1, 8, 64), np.float32),
                               np.zeros((1, 8, 64), np.float32))["params"]
    enh0 = np.asarray(pipeline.enhance_batch(params0, feats)[0])[0]
    e_init = float(estoi(clean[:m], enh0[:m] + noise[:m], 16000))
    assert e_trained > e_init, (e_trained, e_init)


def test_gradients_flow_through_pesq(setup):
    cfg, params, feats, wavs_c, wavs_n, *_ = setup
    grads = jax.grad(direct_metric_loss)(params, feats, wavs_c, wavs_n, cfg,
                                         0.0, 1.0)  # pesq_weight only
    norms = [float(np.abs(np.asarray(g)).max())
             for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert max(norms) > 1e-8
