"""Pallas cascade kernel correctness (interpreter mode on CPU)."""
import numpy as np
import jax.numpy as jnp
from scipy.signal import lfilter

from nelegan_tpu.ops.pallas_scan import gammatone_cascade_pallas


def _ref(x, a):
    den = np.convolve(np.convolve([1, -a], [1, -a]),
                      np.convolve([1, -a], [1, -a]))
    return lfilter([1.0], den, x.astype(np.float64))


def test_cascade_kernel_matches_lfilter():
    rng = np.random.RandomState(0)
    for n, a in [(5000, 0.97), (36000, 0.991), (1024, 0.5)]:
        x = rng.randn(n).astype(np.float32)
        ours = np.asarray(gammatone_cascade_pallas(jnp.asarray(x), a,
                                                   interpret=True))
        ref = _ref(x, a)
        rel = np.abs(ours - ref).max() / np.abs(ref).max()
        assert rel < 2e-5, (n, a, rel)


def test_cascade_kernel_vmap():
    import jax
    rng = np.random.RandomState(1)
    xs = rng.randn(4, 3000).astype(np.float32)
    aa = np.array([0.9, 0.95, 0.8, 0.99], np.float32)
    f = jax.vmap(lambda v, c: gammatone_cascade_pallas(v, c, interpret=True))
    outs = np.asarray(f(jnp.asarray(xs), jnp.asarray(aa)))
    for i in range(4):
        ref = _ref(xs[i], float(aa[i]))
        rel = np.abs(outs[i] - ref).max() / np.abs(ref).max()
        assert rel < 2e-5, (i, rel)
