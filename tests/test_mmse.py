"""MMSE estimator parity vs the reference noise_est/ns.py."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from nelegan_tpu.dsp.mmse import (expint_approx, mmse_lsa, mmse_psd,
                                  mmse_stsa, preemphasis)


@pytest.fixture(scope="module")
def ref_ns():
    try:
        from noise_est import ns
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference ns.py unavailable: {e}")
    return ns


def test_expint_matches_reference(ref_ns):
    nu = np.logspace(-3, 1.5, 200)
    ours = np.asarray(expint_approx(nu))
    ref = ref_ns.expint(nu.copy())
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


@pytest.mark.smoke
def test_mmse_lsa_matches_reference(ref_ns):
    rng = np.random.RandomState(0)
    mu = rng.randn(64, 10) + 1j * rng.randn(64, 10)
    lam = rng.rand(64, 10) + 0.1
    ours = np.asarray(mmse_lsa(mu, lam))
    ref = ref_ns.MMSE_LSA(mu, lam)
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_mmse_psd_matches_reference(ref_ns):
    rng = np.random.RandomState(1)
    mu = rng.randn(32, 5) + 1j * rng.randn(32, 5)
    lam = rng.rand(32, 5) + 0.1
    np.testing.assert_allclose(np.asarray(mmse_psd(mu, lam)),
                               ref_ns.MMSE_PSD(mu, lam), rtol=1e-12)


def test_mmse_stsa_matches_reference(ref_ns):
    rng = np.random.RandomState(2)
    mu = rng.randn(32, 5) + 1j * rng.randn(32, 5)
    lam = rng.rand(32, 5) * 0.1 + 0.01
    ours = np.asarray(mmse_stsa(mu, lam))
    ref = ref_ns.MMSE_STSA(mu.copy(), lam.copy())
    np.testing.assert_allclose(ours.real, ref.real, rtol=1e-6, atol=1e-9)


def test_preemphasis_matches_reference(ref_ns):
    rng = np.random.RandomState(3)
    x = rng.randn(1000)
    ours = np.asarray(preemphasis(x))
    ref = ref_ns.preemphasis(x.copy())
    np.testing.assert_allclose(ours, ref, rtol=1e-12)
