"""Import shims for running the *reference* implementation as a test oracle.

The reference (mounted read-only at /root/reference) depends on packages that
are not installed here (librosa, numba, pysiib, pystoi, pypesq, soundfile).
For golden-data generation we inject minimal stand-ins:

  * ``librosa.stft/istft``  -> torch.stft/istft (same semantics: centered,
    reflect padding, periodic Hann) — torch is the independent STFT oracle;
  * ``librosa.load``        -> scipy PCM16 wav reader scaled to [-1, 1);
  * ``librosa.resample``    -> scipy.signal.resample_poly with a Kaiser LPF;
  * ``numba.jit``           -> identity decorator (pure-Python execution);
  * ``pysiib/pystoi/pypesq``-> import-only stubs (never called for goldens).

Nothing from the reference is copied; modules are imported in place so the
reference's own code computes the golden values.
"""
from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _make_librosa_stub():
    import torch
    import scipy.io.wavfile
    import scipy.signal

    librosa = types.ModuleType("librosa")

    def stft(x, n_fft=2048, hop_length=None, win_length=None, window="hann",
             center=True, **kw):
        hop_length = hop_length or (n_fft // 4)
        win_length = win_length or n_fft
        xt = torch.from_numpy(np.ascontiguousarray(x, dtype=np.float64))
        w = torch.hann_window(win_length, periodic=True, dtype=torch.float64)
        spec = torch.stft(xt, n_fft=n_fft, hop_length=hop_length,
                          win_length=win_length, window=w, center=center,
                          pad_mode="reflect", return_complex=True)
        return spec.numpy()

    def istft(spec, hop_length=None, win_length=None, window="hann",
              center=True, length=None, **kw):
        n_fft = 2 * (spec.shape[0] - 1)
        hop_length = hop_length or (n_fft // 4)
        win_length = win_length or n_fft
        st = torch.from_numpy(np.ascontiguousarray(spec, dtype=np.complex128))
        w = torch.hann_window(win_length, periodic=True, dtype=torch.float64)
        y = torch.istft(st, n_fft=n_fft, hop_length=hop_length,
                        win_length=win_length, window=w, center=center,
                        length=length)
        return y.numpy()

    def load(path, sr=None, **kw):
        rate, data = scipy.io.wavfile.read(path)
        if data.dtype == np.int16:
            data = data.astype(np.float64) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float64) / 2147483648.0
        else:
            data = data.astype(np.float64)
        if data.ndim > 1:
            data = data.mean(axis=1)
        if sr is not None and sr != rate:
            from math import gcd
            g = gcd(int(sr), int(rate))
            data = scipy.signal.resample_poly(data, int(sr) // g, int(rate) // g)
            rate = sr
        return data.astype(np.float32), rate

    def resample(x, orig_sr, target_sr, **kw):
        from math import gcd
        g = gcd(int(orig_sr), int(target_sr))
        return scipy.signal.resample_poly(x, int(target_sr) // g,
                                          int(orig_sr) // g)

    librosa.stft = stft
    librosa.istft = istft
    librosa.load = load
    librosa.resample = resample
    librosa.util = types.SimpleNamespace(fix_length=lambda x, size: x)
    return librosa


def install(noiseless: bool = False, seed: int | None = None):
    """Install stub modules and put the reference on sys.path.

    Args:
      noiseless: patch np.random.randn to zeros — makes the stochastic
        HASPI/HASQI sites (pyhaspi2.py:362-365, 1093) deterministic so the
        JAX port can be compared exactly in its noise-free mode.
      seed: alternatively seed numpy's global PRNG.
    """
    if "librosa" not in sys.modules:
        sys.modules["librosa"] = _make_librosa_stub()

    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def jit(*a, **k):
            if a and callable(a[0]):
                return a[0]
            return lambda f: f

        numba.jit = jit
        sys.modules["numba"] = numba

    for name, symbols in [("pysiib", ["SIIB"]), ("pypesq", ["pesq"])]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for s in symbols:
                setattr(mod, s, None)
            sys.modules[name] = mod

    if "pystoi" not in sys.modules:
        pystoi = types.ModuleType("pystoi")
        stoi_mod = types.ModuleType("pystoi.stoi")
        stoi_mod.stoi = None
        pystoi.stoi = stoi_mod
        sys.modules["pystoi"] = pystoi
        sys.modules["pystoi.stoi"] = stoi_mod

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    if noiseless:
        np.random.randn = lambda *shape: np.zeros(shape)
    elif seed is not None:
        np.random.seed(seed)


def load_wav(path: str) -> tuple[np.ndarray, int]:
    """PCM16 wav -> float in [-1, 1), like librosa.load(sr=None)."""
    import scipy.io.wavfile
    rate, data = scipy.io.wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float64) / 32768.0
    if data.ndim > 1:
        data = data.mean(axis=1)
    return data, rate
