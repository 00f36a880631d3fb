"""Native wav loader + bucketed pipeline tests."""
import os

import numpy as np
import pytest
import scipy.io.wavfile as wavfile

from nelegan_tpu.data import (read_wav, read_wav_batch, write_wav_pcm16,
                              wav_length, native_available, CorpusIndex,
                              BucketedLoader)

TOY = "/root/reference/toy_dataset"


def test_native_builds():
    assert native_available(), "csrc/wavio.cpp failed to build"


def test_read_matches_scipy(tmp_path):
    p = os.path.join(TOY, "Train/Clean/f_hvd_100#Babble#-11.wav")
    ours, rate = read_wav(p)
    r2, ref = wavfile.read(p)
    ref = ref.astype(np.float32) / 32768.0
    assert rate == r2 == 16000
    assert len(ours) == len(ref) == wav_length(p)
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_write_read_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    x = np.clip(rng.randn(5000) * 0.1, -1, 1).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav_pcm16(p, x, 16000)
    y, rate = read_wav(p)
    assert rate == 16000
    assert len(y) == len(x)
    np.testing.assert_allclose(y, x, atol=1.0 / 32768.0)


def test_batch_read_threads():
    paths = [os.path.join(TOY, "Train/Clean/f_hvd_100#Babble#-11.wav"),
             os.path.join(TOY, "Test/Clean/f_hvd_669#AirportAnnouncement#-9.wav")]
    n = max(wav_length(p) for p in paths)
    wavs, lens, rates = read_wav_batch(paths, n, n_threads=4)
    assert (rates == 16000).all()
    for i, p in enumerate(paths):
        ref, _ = read_wav(p)
        np.testing.assert_allclose(wavs[i, :lens[i]], ref, atol=1e-7)
        assert np.all(wavs[i, lens[i]:] == 0)


def test_bucketed_loader():
    idx = CorpusIndex([os.path.join(TOY, "Train/Clean/f_hvd_100#Babble#-11.wav")],
                      os.path.join(TOY, "Train/Noise"),
                      extra_dir=os.path.join(TOY, "Train/MultiEnh"))
    loader = BucketedLoader(idx, batch_size=4, with_extra=True)
    batches = list(loader())
    assert len(batches) == 1
    b = batches[0]
    assert b.clean.shape == b.noise.shape == b.extra.shape
    assert b.clean.shape[1] % 4096 == 512  # bucket + n_fft
    assert b.lengths[0] == 33536
    assert b.names == ["f_hvd_100#Babble#-11.wav"]


def test_batch_decode_failure_raises(tmp_path):
    """A corrupt wav in a batch raises like the single-file path instead of
    silently producing a zero 'utterance' with length -1."""
    import numpy as np
    import pytest
    from nelegan_tpu.data import wavio
    if not wavio._load_lib():
        pytest.skip("native wavio unavailable")
    good = tmp_path / "good.wav"
    wavio.write_wav_pcm16(str(good), 0.01 * np.ones(1000, np.float32))
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"this is not a RIFF file at all..........")
    with pytest.raises(IOError):
        wavio.read_wav_batch([str(good), str(bad)], 2000)
