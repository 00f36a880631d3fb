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


def test_ear_model_hl_golden(goldens):
    """HL != 0 exercises the loss-parameter / compression branches the
    HL=0 goldens never touch (attnOHC threshold clamp, widened BW, IHC
    attenuation).  Reference golden captured at itype=0 — the reference's
    itype=1 path calls its own unimplemented eb_NALR stub
    (pyHASPI/pyhaspi2.py:830-831), so only our side implements it."""
    g = goldens("ear_model_hl")
    out = ear_model(g["x24"], g["y24"], hl=g["hl"])
    for mine, ref in [(out.xdb, g["xdB"]), (out.ydb, g["ydB"]),
                      (out.ybm, g["yBM"])]:
        rel = np.abs(np.asarray(mine) - ref).max() / np.abs(ref).max()
        assert rel < 1e-6, rel  # goldens stored f32
    np.testing.assert_allclose(np.asarray(out.xsl), g["xSL"],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.ysl), g["ySL"],
                               rtol=1e-6, atol=1e-6)


def test_haspi_v2_hl_golden(goldens):
    g = goldens("ear_model_hl")
    v2, avecm = haspi_v2_24k(g["x24"], g["y24"], hl=g["hl"])
    np.testing.assert_allclose(float(v2), float(g["haspi_v2"]), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(avecm), g["haspi_v2_raw"],
                               rtol=1e-6, atol=1e-8)


def test_nalr_fir_properties():
    """eb_NALR (beyond-reference: the reference stub raises).  The FIR is
    linear phase (symmetric up to design rounding), hits the NAL-R
    prescription gains at the audiometric frequencies, and degrades to a
    pure delay at zero loss."""
    import numpy.fft as nfft
    from nelegan_tpu.metrics.haspi.ear_model import nalr_fir

    hl = np.array([30.0, 30.0, 40.0, 50.0, 60.0, 65.0])
    taps = np.asarray(nalr_fir(jnp_asarray(hl)))
    assert taps.shape == (141,)
    np.testing.assert_allclose(taps, taps[::-1], atol=1e-4)  # linear phase

    # prescription: X + 0.31*HL + corrections, floored at 0
    x = 0.05 * (hl[1] + hl[2] + hl[3])
    want = np.maximum(x + 0.31 * hl
                      + np.array([-17.0, -8.0, 1.0, -1.0, -2.0, -2.0]), 0.0)
    freqs = np.array([250.0, 500.0, 1000.0, 2000.0, 4000.0, 6000.0])
    w = np.exp(-2j * np.pi * freqs / 24000.0)
    resp = np.polyval(taps[::-1], 0) * 0  # placeholder shape
    resp = np.array([np.abs(np.sum(taps * w_i ** np.arange(141)))
                     for w_i in w])
    got_db = 20.0 * np.log10(resp)
    np.testing.assert_allclose(got_db, want, atol=2.0)  # design ripple (edge band)

    # zero loss: pure delay of nfir/2
    t0 = np.asarray(nalr_fir(jnp_asarray(np.zeros(6))))
    assert t0[70] == 1.0 and np.abs(np.delete(t0, 70)).max() == 0.0


def test_haspi_v2_itype1_runs():
    """NAL-R compensated scoring path compiles and shifts the score for a
    hearing-impaired listener (beyond-reference coverage)."""
    rng = np.random.RandomState(0)
    x = rng.randn(12000).astype(np.float64) * 0.1
    y = x + rng.randn(12000) * 0.02
    hl = np.array([30.0, 30.0, 40.0, 50.0, 60.0, 65.0])
    v_plain, _ = haspi_v2_24k(x, y, hl=jnp_asarray(hl))
    v_nalr, _ = haspi_v2_24k(x, y, hl=jnp_asarray(hl), itype=1)
    assert np.isfinite(float(v_plain)) and np.isfinite(float(v_nalr))
    assert float(v_plain) != float(v_nalr)


def jnp_asarray(a):
    import jax.numpy as jnp
    return jnp.asarray(a)
