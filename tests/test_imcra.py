"""IMCRA lax.scan parity vs the reference per-frame Python loop."""
import pytest
import numpy as np

from nelegan_tpu.dsp import imcra_estimate_psd


def test_imcra_golden_f64(goldens):
    g = goldens("imcra")
    spec = g["spec_real"] + 1j * g["spec_imag"]
    ours = np.asarray(imcra_estimate_psd(spec))
    np.testing.assert_allclose(ours, g["psd"], rtol=1e-6, atol=1e-12)


@pytest.mark.smoke
def test_imcra_golden_f32(goldens):
    g = goldens("imcra")
    spec = (g["spec_real"] + 1j * g["spec_imag"]).astype(np.complex64)
    ours = np.asarray(imcra_estimate_psd(spec))
    rel = np.abs(ours - g["psd"]) / (np.abs(g["psd"]) + 1e-12)
    # f32 recursions accumulate small error; median relative error stays tiny
    assert np.median(rel) < 1e-4
    assert np.percentile(rel, 99) < 2e-2
