"""HASPI v1/v2 + HASQI v2 parity vs reference goldens (noiseless mode)."""
import numpy as np
import pytest

from nelegan_tpu.metrics.haspi import (haspi_v2_24k, haspi_v1_24k,
                                       hasqi_v2_24k)
from nelegan_tpu.metrics.haspi.ear_model import ear_model


@pytest.fixture(scope="module")
def signals(goldens):
    g = goldens("haspi_scores")
    return g


def test_ear_model_golden(goldens):
    g = goldens("ear_model")
    out = ear_model(g["x24"], g["y24"])
    for mine, ref in [(out.xdb, g["xdB"]), (out.ydb, g["ydB"]),
                      (out.xbm, g["xBM"]), (out.ybm, g["yBM"])]:
        rel = np.abs(np.asarray(mine) - ref).max() / np.abs(ref).max()
        assert rel < 1e-6, rel  # goldens stored f32
    np.testing.assert_allclose(np.asarray(out.xsl), g["xSL"],
                               rtol=1e-6, atol=1e-6)


def test_haspi_v2_golden(signals):
    v2, avecm = haspi_v2_24k(signals["x24"], signals["y24"])
    np.testing.assert_allclose(float(v2), float(signals["haspi_v2"]),
                               rtol=1e-7)
    np.testing.assert_allclose(np.asarray(avecm), signals["haspi_v2_raw"],
                               rtol=1e-6, atol=1e-8)


def test_haspi_v1_golden(signals):
    v1, raw = haspi_v1_24k(signals["x24"], signals["y24"])
    np.testing.assert_allclose(float(v1), float(signals["haspi_v1"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(raw), signals["haspi_v1_raw"],
                               rtol=1e-6, atol=1e-8)


def test_hasqi_v2_golden(signals):
    q, qn, ql, raw = hasqi_v2_24k(signals["x24"], signals["y24"])
    np.testing.assert_allclose(float(q), float(signals["hasqi_v2"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(raw), signals["hasqi_raw"],
                               rtol=1e-6, atol=1e-8)


def test_haspi_v2_f32(signals):
    """TPU-realistic f32 numerics stay within GAN-training tolerance."""
    v2, _ = haspi_v2_24k(signals["x24"].astype(np.float32),
                         signals["y24"].astype(np.float32))
    assert abs(float(v2) - float(signals["haspi_v2"])) < 2e-3


def test_haspi_v2_noise_mode(signals):
    """Stochastic mode: different keys give slightly different scores."""
    import jax
    x = signals["x24"].astype(np.float32)
    y = signals["y24"].astype(np.float32)
    a, _ = haspi_v2_24k(x, y, key=jax.random.PRNGKey(1), noise_scale=1.0)
    b, _ = haspi_v2_24k(x, y, key=jax.random.PRNGKey(2), noise_scale=1.0)
    c, _ = haspi_v2_24k(x, y, key=jax.random.PRNGKey(1), noise_scale=1.0)
    assert float(a) != float(b)
    assert float(a) == float(c)          # keyed -> reproducible
    assert abs(float(a) - float(signals["haspi_v2"])) < 0.05
