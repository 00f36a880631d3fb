"""Featurization / resynthesis / resample / ASL parity tests."""
import pytest
import numpy as np
import scipy.signal

from nelegan_tpu.dsp import (featurize_speech, featurize_noise, resynthesize,
                             resample_poly, asl_p56)


@pytest.mark.smoke
def test_featurize_speech_golden(goldens):
    g = goldens("features")
    band, mag, phase = featurize_speech(g["clean"].astype(np.float64))
    np.testing.assert_allclose(np.asarray(mag), g["clean_mag"], rtol=1e-7,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(band), g["clean_band"], rtol=1e-5,
                               atol=1e-8)


def test_featurize_noise_golden(goldens):
    g = goldens("features")
    band, _, _ = featurize_noise(g["noise"].astype(np.float64))
    np.testing.assert_allclose(np.asarray(band), g["noise_band"], rtol=1e-5,
                               atol=1e-8)


def test_resynthesize_golden(goldens):
    g = goldens("features")
    r = goldens("resyn")
    wav = resynthesize(r["alpha2"], g["clean_mag"].astype(np.float64),
                       g["clean_phase"].astype(np.float64))
    np.testing.assert_allclose(np.asarray(wav), r["wav"], rtol=1e-6, atol=1e-9)


def test_resample_matches_scipy():
    rng = np.random.RandomState(7)
    for up, down, n in [(3, 2, 16000), (2, 3, 9001), (5, 8, 4000)]:
        x = rng.randn(n)
        ours = np.asarray(resample_poly(x, up, down))
        ref = scipy.signal.resample_poly(x, up, down)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-10)


def test_asl_p56_golden(goldens):
    g = goldens("asl_p56")
    msq, act, c0 = asl_p56(g["wav"].astype(np.float64), 16000, 16)
    np.testing.assert_allclose(float(msq), g["asl_msq"][0], rtol=1e-6)
    np.testing.assert_allclose(float(act), g["actfact"][0], rtol=1e-6)
    np.testing.assert_allclose(float(c0), g["c0"][0], rtol=1e-6)
