"""Cross-validation of ESTOI / SIIB^Gauss against independent numpy oracles.

The reference's ground truth for these metrics is pystoi / pysiib
(/root/reference/intel.py:4,8), which are not installable here.  Round 1
had only property tests; these tests close that gap with clean-room numpy
oracles written straight from the publications (tools/oracles/) sharing no
code with the package: a mis-set band matrix, a wrong frame rule, or an
off-by-one in the 40 dB silence threshold in either implementation shows
up as disagreement.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.oracles.estoi_np import estoi_oracle
from tools.oracles.siib_np import siib_gauss_oracle

FS = 16000
TOY_DIR = "/root/reference/toy_dataset/Train"


def _speech_like(seed: int, seconds: float, silence_head: float = 0.3,
                 mod_hz: float = 3.1) -> np.ndarray:
    """Modulated noise with speech-ish 3 Hz envelope + a silent head, so
    the 40 dB silence-removal path is actually exercised."""
    rng = np.random.RandomState(seed)
    n = int(FS * seconds)
    t = np.arange(n) / FS
    x = (np.sin(2 * np.pi * mod_hz * t) ** 2) * rng.randn(n) * 0.1
    head = int(FS * silence_head)
    x[:head] = 1e-6 * rng.randn(head)
    return x


def _pairs():
    """(clean, degraded) grid: SNR sweep x seeds x lengths."""
    out = []
    for seed, seconds in [(0, 2.0), (1, 3.0), (2, 1.5)]:
        x = _speech_like(seed, seconds)
        rng = np.random.RandomState(100 + seed)
        for snr_db in (-5.0, 5.0, 15.0):
            noise = rng.randn(len(x))
            noise *= np.sqrt((x ** 2).mean() / (noise ** 2).mean()
                             / 10 ** (snr_db / 10))
            out.append((x, x + noise))
        # a nonlinear degradation (clipping) too — metric paths differ
        out.append((x, np.clip(x, -0.05, 0.05)))
    return out


@pytest.fixture(scope="module")
def cpu_f64():
    import jax
    jax.config.update("jax_enable_x64", True)
    yield


def test_estoi_matches_oracle(cpu_f64):
    from nelegan_tpu.metrics.estoi import estoi
    for x, y in _pairs():
        ours = float(estoi(x, y, FS))
        ref = estoi_oracle(x, y, FS)
        assert abs(ours - ref) < 1e-8, (ours, ref)


def test_siib_matches_oracle(cpu_f64):
    from nelegan_tpu.metrics.siib import siib
    for x, y in _pairs():
        ours = float(siib(x, y, FS, use_vad_tiling=False))
        ref = siib_gauss_oracle(x, y, FS)
        # eigh basis sign/eps details differ; scores agree to ~1e-4 rel
        assert abs(ours - ref) <= 1e-4 * max(abs(ref), 1.0), (ours, ref)


def test_bucketed_padded_paths_match_oracle(cpu_f64):
    """The static-shape machinery (n_valid masking, zero-padded buckets)
    must score exactly like the oracle's dynamic-shape pipeline."""
    import jax.numpy as jnp
    from nelegan_tpu.metrics.estoi import estoi_10k
    from nelegan_tpu.metrics.siib import siib_gauss_16k
    from nelegan_tpu.dsp.resample import resample_poly

    x = _speech_like(5, 2.0)
    rng = np.random.RandomState(55)
    y = x + 0.3 * rng.randn(len(x)) * x.std()

    pad = 8000
    xp = np.pad(x, (0, pad))
    yp = np.pad(y, (0, pad))

    ours = float(siib_gauss_16k(jnp.asarray(xp), jnp.asarray(yp),
                                jnp.int32(len(x))))
    ref = siib_gauss_oracle(x, y, FS)
    assert abs(ours - ref) <= 1e-4 * max(abs(ref), 1.0), (ours, ref)

    x10 = np.asarray(resample_poly(jnp.asarray(x), 5, 8))
    y10 = np.asarray(resample_poly(jnp.asarray(y), 5, 8))
    xp10 = np.pad(x10, (0, pad))
    yp10 = np.pad(y10, (0, pad))
    ours = float(estoi_10k(jnp.asarray(xp10), jnp.asarray(yp10),
                           jnp.int32(len(x10))))
    ref = estoi_oracle(x10, y10, 10000)
    assert abs(ours - ref) < 1e-8, (ours, ref)


@pytest.mark.skipif(not os.path.isdir(TOY_DIR),
                    reason="reference mount unavailable")
def test_oracles_on_toy_dataset(cpu_f64):
    """Real speech: the bundled toy utterance vs its noise."""
    import scipy.io.wavfile as wavfile
    from nelegan_tpu.metrics.estoi import estoi
    from nelegan_tpu.metrics.siib import siib

    name = "f_hvd_100#Babble#-11.wav"
    _, c = wavfile.read(os.path.join(TOY_DIR, "Clean", name))
    _, n = wavfile.read(os.path.join(TOY_DIR, "Noise", name))
    x = c.astype(np.float64) / 32768.0
    y = x + n.astype(np.float64) / 32768.0

    ours = float(estoi(x, y, FS))
    ref = estoi_oracle(x, y, FS)
    assert abs(ours - ref) < 1e-8, (ours, ref)

    ours = float(siib(x, y, FS, use_vad_tiling=False))
    ref = siib_gauss_oracle(x, y, FS)
    assert abs(ours - ref) <= 1e-4 * max(abs(ref), 1.0), (ours, ref)


def test_estoi_matches_pystoi_reconstruction(cpu_f64):
    """Third anchor for ESTOI (round-2 VERDICT item 7): the JAX metric and
    the paper-derived oracle vs a from-memory reconstruction of the pystoi
    PACKAGE source (tools/oracles/pystoi_recon.py) — an independent channel
    for pystoi-specific behaviors (open-Hann window, exclusive framing,
    overlap-added silence removal, argmin band snapping) that the paper
    does not pin down.  Not an engine-run golden (pystoi is not
    installable here); it bounds the shared-misreading risk."""
    import jax.numpy as jnp
    from tools.oracles.pystoi_recon import estoi_pystoi_10k
    from nelegan_tpu.metrics.estoi import estoi_10k
    from nelegan_tpu.dsp.resample import resample_poly

    for x, y in _pairs():
        x10 = np.asarray(resample_poly(jnp.asarray(x), 5, 8))
        y10 = np.asarray(resample_poly(jnp.asarray(y), 5, 8))
        recon = estoi_pystoi_10k(x10, y10)
        ours = float(estoi_10k(jnp.asarray(x10), jnp.asarray(y10)))
        paper = estoi_oracle(x10, y10, 10000)
        assert abs(ours - recon) < 1e-7, (ours, recon)
        assert abs(paper - recon) < 1e-7, (paper, recon)
