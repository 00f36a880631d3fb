"""STFT/iSTFT parity vs torch (librosa-semantics oracle) + round-trip."""
import pytest
import numpy as np
import torch

from nelegan_tpu.dsp import stft, istft


def _torch_stft(x, n_fft=512, hop=256):
    w = torch.hann_window(n_fft, periodic=True, dtype=torch.float64)
    return torch.stft(torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
                      win_length=n_fft, window=w, center=True,
                      pad_mode="reflect", return_complex=True).numpy()


def test_stft_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(16000).astype(np.float64)
    ours = np.asarray(stft(x))
    ref = _torch_stft(x)
    assert ours.shape == ref.shape == (257, 63)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-10)


def test_stft_float32():
    rng = np.random.RandomState(2)
    x = rng.randn(8192).astype(np.float32)
    ours = np.asarray(stft(x))
    ref = _torch_stft(x.astype(np.float64))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_istft_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(16000).astype(np.float64)
    spec = _torch_stft(x)
    ours = np.asarray(istft(spec))
    w = torch.hann_window(512, periodic=True, dtype=torch.float64)
    ref = torch.istft(torch.from_numpy(spec), n_fft=512, hop_length=256,
                      win_length=512, window=w, center=True).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-10)


@pytest.mark.smoke
def test_round_trip():
    rng = np.random.RandomState(4)
    x = rng.randn(12345).astype(np.float64) * 0.1
    y = np.asarray(istft(stft(x), length=len(x)))
    # interior samples reconstruct exactly (COLA); edges affected by padding
    np.testing.assert_allclose(y[512:-1024], x[512:-1024], rtol=0, atol=1e-10)


def test_batched():
    rng = np.random.RandomState(5)
    x = rng.randn(3, 10000).astype(np.float64)
    spec = np.asarray(stft(x))
    assert spec.shape == (3, 257, 40)
    single = np.asarray(stft(x[1]))
    np.testing.assert_allclose(spec[1], single, rtol=1e-12, atol=0)


def test_stft_short_signal_reflect():
    """Signals shorter than n_fft//2 pad by repeated reflection like
    numpy/librosa instead of crashing (jnp.pad mode='reflect' rejects
    pad >= n)."""
    import numpy as np
    import jax.numpy as jnp
    from nelegan_tpu.dsp.stft import stft, frame_signal
    x = np.sin(np.arange(200) * 0.05).astype(np.float32)
    spec = np.asarray(stft(jnp.asarray(x)))
    assert np.isfinite(spec).all() and spec.shape[0] == 257
    # framing equals numpy's reflect-pad framing
    ref = np.pad(x, 256, mode="reflect")
    got = np.asarray(frame_signal(jnp.asarray(x), 512, 256))
    want = np.stack([ref[i * 256:i * 256 + 512]
                     for i in range(1 + (len(ref) - 512) // 256)])
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_istft_win_length_round_trip():
    """istft honours win_length < n_fft (zero-padded centered window): the
    weighted-OLA inversion is exact wherever the window power is nonzero."""
    import numpy as np
    import jax.numpy as jnp
    from nelegan_tpu.dsp.stft import stft, istft
    rng = np.random.RandomState(0)
    x = rng.randn(4096).astype(np.float64)
    spec = stft(jnp.asarray(x), win_length=400)
    y = np.asarray(istft(spec, win_length=400, length=len(x)))
    # interior samples (away from the centering pad edges) reconstruct
    interior = slice(512, len(x) - 512)
    np.testing.assert_allclose(y[interior], x[interior], rtol=0, atol=1e-8)
