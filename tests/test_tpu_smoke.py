"""On-device smoke tests (run with NELE_TEST_PLATFORM=axon pytest
tests/test_tpu_smoke.py).  The main suite checks f64 parity on CPU; these
check the same flows execute correctly on the real TPU at f32 tolerances.
"""
import os

import numpy as np
import pytest

if os.environ.get("NELE_TEST_PLATFORM", "cpu") == "cpu":
    pytest.skip("TPU smoke tests need NELE_TEST_PLATFORM=axon",
                allow_module_level=True)


def test_stft_roundtrip_f32():
    from nelegan_tpu.dsp import stft, istft
    rng = np.random.RandomState(0)
    x = (rng.randn(12288) * 0.1).astype(np.float32)
    y = np.asarray(istft(stft(x), length=len(x)))
    np.testing.assert_allclose(y[512:-1024], x[512:-1024], atol=1e-4)


def test_enhance_batch_on_device():
    import jax
    from nelegan_tpu import pipeline
    from nelegan_tpu.models.generator import Generator
    rng = np.random.RandomState(1)
    wavs = [(0.03 * rng.randn(n)).astype(np.float32)
            for n in (16000, 20000)]
    noises = [(0.03 * rng.randn(len(w))).astype(np.float32) for w in wavs]
    clean_p, lens = pipeline.reflect_pad_batch(wavs)
    noise_p, _ = pipeline.reflect_pad_batch(noises)
    params = Generator().init(jax.random.PRNGKey(0),
                              np.zeros((1, 8, 64), np.float32),
                              np.zeros((1, 8, 64), np.float32))["params"]
    feats = pipeline.featurize_batch(clean_p, noise_p, lens)
    out, alpha2, out_lens = pipeline.enhance_batch(params, feats)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    for i in range(2):
        m = int(out_lens[i])
        rms = np.sqrt((out[i, :m] ** 2).mean())
        np.testing.assert_allclose(rms, 0.03, rtol=1e-3)


def test_haspi_f32_matches_golden():
    from nelegan_tpu.metrics.haspi import haspi_v2_24k
    g = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                             "haspi_scores.npz"))
    v, _ = haspi_v2_24k(g["x24"].astype(np.float32),
                        g["y24"].astype(np.float32))
    assert abs(float(v) - float(g["haspi_v2"])) < 5e-3


def test_train_steps_on_device():
    import jax
    from nelegan_tpu.config import Config
    from nelegan_tpu.train import gan
    from nelegan_tpu import pipeline
    cfg = Config()
    rng = np.random.RandomState(2)
    wavs = [(0.03 * rng.randn(12288)).astype(np.float32) for _ in range(2)]
    clean_p, lens = pipeline.reflect_pad_batch(wavs)
    noise_p, _ = pipeline.reflect_pad_batch(
        [(0.03 * rng.randn(12288)).astype(np.float32) for _ in range(2)])
    state = gan.init_train_state(jax.random.PRNGKey(0), cfg)
    feats = pipeline.featurize_batch(clean_p, noise_p, lens)
    state, loss = gan.g_step(state, feats, cfg)
    assert np.isfinite(float(loss))
    img3, img2, frames = gan.featurize_triple(clean_p, noise_p, clean_p,
                                              lens, cfg)
    t3 = np.full((2, 3), 0.7, np.float32)
    t2 = np.full((2, 2), 0.7, np.float32)
    state, ld, lq = gan.d_step(state, img3, img2, frames, t3, t2, cfg)
    assert np.isfinite(float(ld)) and np.isfinite(float(lq))
