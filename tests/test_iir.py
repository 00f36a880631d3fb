"""IIR scan primitives: parity vs scipy.lfilter and blocked-vs-scan."""
import numpy as np
import jax.numpy as jnp
from scipy.signal import lfilter

from nelegan_tpu.ops.iir import (one_pole, one_pole_blocked,
                                 one_pole_cascade, biquad, fir)


def test_one_pole_matches_lfilter():
    rng = np.random.RandomState(0)
    x = rng.randn(10000)
    for a in [0.5, 0.99, -0.3]:
        ours = np.asarray(one_pole(jnp.asarray(x), a))
        ref = lfilter([1.0], [1.0, -a], x)
        np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)


def test_one_pole_blocked_matches_scan():
    rng = np.random.RandomState(1)
    for n in [1000, 4096, 50001]:
        x = rng.randn(n)
        for a in [0.99, 0.5]:
            blocked = np.asarray(one_pole_blocked(jnp.asarray(x), a))
            ref = lfilter([1.0], [1.0, -a], x)
            np.testing.assert_allclose(blocked, ref, rtol=1e-8, atol=1e-9)


def test_one_pole_blocked_f32():
    rng = np.random.RandomState(2)
    x = rng.randn(30000).astype(np.float32)
    ref = lfilter([1.0], [1.0, -0.99], x.astype(np.float64))
    blocked = np.asarray(one_pole_blocked(jnp.asarray(x), np.float32(0.99)))
    rel = np.abs(blocked - ref) / (np.abs(ref).max())
    assert rel.max() < 1e-4


def test_cascade_blocked_matches_sequential():
    rng = np.random.RandomState(3)
    x = rng.randn(12000)
    a = 0.97
    seq = np.asarray(one_pole_cascade(jnp.asarray(x), a, 4, blocked=False))
    blk = np.asarray(one_pole_cascade(jnp.asarray(x), a, 4, blocked=True))
    np.testing.assert_allclose(blk, seq, rtol=1e-7, atol=1e-7)


def test_biquad_matches_lfilter():
    rng = np.random.RandomState(4)
    x = rng.randn(5000)
    b = [0.937260390269893, -1.874520780539785, 0.937260390269893]
    a = [1.0, -1.870580640735279, 0.878460920344291]
    ours = np.asarray(biquad(jnp.asarray(x), b, a))
    ref = lfilter(b, a, x)
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-10)


def test_fir():
    rng = np.random.RandomState(5)
    x = rng.randn(300)
    taps = [0.4, -0.2, 0.1]
    ours = np.asarray(fir(jnp.asarray(x), jnp.asarray(taps)))
    ref = lfilter(taps, [1.0], x)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)
