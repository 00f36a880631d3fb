"""Reverb utilities parity vs scipy.lfilter + reference clip semantics."""
import numpy as np
import jax.numpy as jnp
from scipy.signal import lfilter

from nelegan_tpu.dsp.reverb import fir_filter, direct_path_rir, clip_overflow


def test_fir_filter_matches_lfilter():
    rng = np.random.RandomState(0)
    x = rng.randn(8000)
    rir = rng.randn(1500) * np.exp(-np.arange(1500) / 300.0)
    ours = np.asarray(fir_filter(jnp.asarray(rir), jnp.asarray(x)))
    ref = lfilter(rir, [1.0], x)
    np.testing.assert_allclose(ours, ref, rtol=1e-7, atol=1e-9)


def test_direct_path():
    rir = np.zeros(1000)
    rir[100] = 1.0
    rir[500] = 0.5
    h = direct_path_rir(rir, tau=32)
    assert h[100] == 1.0 and h[500] == 0.0
    assert np.all(h[132:] == 0)


def test_clip_overflow():
    x = np.array([1.5, -1.2, 0.3])
    y = clip_overflow(x.copy())
    assert y.max() < 1.0 and y.min() >= -1.0
    # scaling matches the reference's iterative shrink (audio_util.py:67-74)
    ref = x.copy()
    small = 0.05
    while ref.max() >= 1 or ref.min() < -1:
        ref = ref / (1.0 + small)
        small += 0.05
    np.testing.assert_allclose(y, ref)
    z = np.array([0.5, -0.5])
    np.testing.assert_allclose(clip_overflow(z.copy()), z)
