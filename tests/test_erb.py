"""ERB band matmul parity vs reference compute_band_E / interp_band_gain."""
import pytest
import numpy as np

from nelegan_tpu.dsp import band_energy, interp_band_gain


@pytest.mark.smoke
def test_band_energy_golden(goldens):
    g = goldens("erb")
    ours = np.asarray(band_energy(g["mag"]))
    np.testing.assert_allclose(ours, g["band_e"], rtol=1e-6, atol=1e-9)


def test_interp_band_gain_golden(goldens):
    g = goldens("erb")
    ours = np.asarray(interp_band_gain(g["gain_in"]))
    np.testing.assert_allclose(ours, g["gains"], rtol=1e-9, atol=1e-12)


def test_band_energy_conserves_power():
    # the triangular weights of adjacent bands sum to 1 per bin
    rng = np.random.RandomState(0)
    mag = rng.rand(5, 257)
    be = np.asarray(band_energy(mag))
    np.testing.assert_allclose(be.sum(-1), (mag ** 2).sum(-1), rtol=1e-9)
