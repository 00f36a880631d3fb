"""MMSE STFT speech estimators — support library parity with the
reference's noise_est/ns.py (MMSE-LSA/PSD/STSA, expint approximation,
SegSNR, preemphasis).  Only MMSE_LSA is exercised by the enhancement class
(reference: noise_est/imcra.py:128); the rest are provided for API parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def expint_approx(nu: jnp.ndarray) -> jnp.ndarray:
    """R. Martin's piecewise exponential-integral approximation
    (reference: noise_est/ns.py:202-213).  Note the reference's last branch
    overwrites the middle one for nu in (0.1, 1]; reproduced faithfully."""
    out = jnp.where(nu < 0.1, -2.31 * jnp.log10(nu) - 0.6,
                    -1.544 * jnp.log10(nu) + 0.166)
    return jnp.where(nu > 0.1, 10.0 ** (-0.52 * nu - 0.26), out)


def mmse_lsa(mu: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """MMSE log-spectral-amplitude estimator (ns.py:123-133)."""
    nu = (jnp.abs(mu) ** 2) / lam
    return mu * jnp.exp(0.5 * expint_approx(nu))


def mmse_psd(mu: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """MMSE squared-amplitude estimator (ns.py:135-143)."""
    return jnp.abs(mu) ** 2 + lam


def mmse_stsa(mu: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """MMSE short-time spectral amplitude estimator (ns.py:145-173)."""
    nu = (jnp.abs(mu) ** 2) / lam
    # i0e is exp(-|x|)*I0(x), so
    # gamma(1.5) * sqrt(lam) * exp(-nu/2) * ((1+nu) I0(nu/2) + nu I1(nu/2))
    #   = gamma(1.5) * sqrt(lam) * ((1+nu) i0e(nu/2) + nu i1e(nu/2))
    gamma_15 = 0.8862269254527581
    i0e = jax.scipy.special.i0e(nu / 2.0)
    i1e = jax.scipy.special.i1e(nu / 2.0)
    stsa = gamma_15 * jnp.sqrt(lam) * ((1.0 + nu) * i0e + nu * i1e)
    # Wiener approximation for very high nu (reference threshold 1300)
    return jnp.where(nu >= 1300.0, mu, stsa.astype(mu.dtype))


def preemphasis(x: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """HTK-style pre-emphasis (ns.py:4-18)."""
    head = x[..., :1] * (1.0 - coef)
    return jnp.concatenate([head, x[..., 1:] - coef * x[..., :-1]], axis=-1)


def seg_snr(x: jnp.ndarray, d: jnp.ndarray, windowsize: int = 400,
            shift: int = 160) -> jnp.ndarray:
    """Segmental SNR (ns.py:175-200)."""
    import numpy as np
    n = x.shape[-1]
    nfr = (n - windowsize) // shift + 1
    idx = np.arange(nfr)[:, None] * shift + np.arange(windowsize)[None, :]
    se = jnp.sum(x[..., idx] ** 2, -1)
    ne = jnp.sum(d[..., idx] ** 2, -1)
    return 10.0 * jnp.mean(jnp.log10(se / jnp.maximum(ne, 1e-30)), -1)


def mmse_lsa_enhance(spec: jnp.ndarray, alpha: float = 0.92,
                     xi_min: float = 10.0 ** (-25.0 / 20.0)) -> jnp.ndarray:
    """Full IMCRA + MMSE-LSA enhancement of a noisy complex STFT — the
    reference's `imcra_se.update` loop (noise_est/imcra.py:90-148) as a scan
    on top of the IMCRA PSD tracker."""
    from nelegan_tpu.dsp.imcra import imcra_estimate_psd
    from nelegan_tpu.config import ImcraConfig
    cfg = ImcraConfig(alpha_dd=alpha, xi_min=xi_min, is_frames=10)
    psd = imcra_estimate_psd(spec, cfg)                 # [K, T]
    # decision-directed gain recursion over frames
    y2 = (spec.real ** 2 + spec.imag ** 2).T            # [T, K]
    lam_prev = jnp.concatenate(
        [jnp.full_like(psd.T[:1], 1e-6), psd.T[:-1]], 0)

    def step(carry, inp):
        g, gamma_prev = carry
        y2_l, lam_l = inp
        xi_g = g * g * gamma_prev
        gamma = y2_l / jnp.maximum(lam_l, 1e-30)
        xi_ml = jnp.maximum(gamma - 1.0, 1e-6)
        xi = jnp.maximum(alpha * xi_g + (1 - alpha) * xi_ml, xi_min)
        g_new = xi / (1.0 + xi)
        return (g_new, gamma), g_new

    k = y2.shape[-1]
    init = (jnp.ones((k,), y2.dtype), jnp.ones((k,), y2.dtype))
    _, gains = jax.lax.scan(step, init, (y2, lam_prev))  # [T, K]
    mu = gains.T * spec
    lam_w = gains.T * lam_prev.T
    return mmse_lsa(mu, lam_w)
