"""End-to-end pipeline tests: single-utterance vs reference torch+numpy,
batched vs single."""
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from nelegan_tpu.models import Generator, torch_generator_to_flax
from nelegan_tpu import pipeline


@pytest.fixture(scope="module")
def gen_params():
    import model as ref_model
    torch.manual_seed(7)
    g_ref = ref_model.Generator_Conv1D_cLN().eval()
    return g_ref, torch_generator_to_flax(g_ref.state_dict())


def _ref_enhance(g_ref, clean, noise):
    """Reference inference path (inference.py:90-109) via the reference's own
    numpy/torch code, with the librosa shims installed."""
    sys.path.insert(0, "/root/repo/tools")
    import ref_shims
    ref_shims.install()
    import audio_util

    p = 1.0 / 6.0
    cb, cm, cp = audio_util.Sp_and_phase_Speech(clean, power=p)
    nb, _, _ = audio_util.Sp_and_phase_Noise(noise, power=p)
    with torch.no_grad():
        mask = g_ref(torch.from_numpy(cb[None]).float(),
                     torch.from_numpy(nb[None]).float())
        clean_power = torch.pow(torch.from_numpy(cb[None]).float(), 6)
        beta2 = torch.sum(clean_power) / torch.sum(mask * clean_power)
        alpha2 = (mask * beta2).squeeze(0).numpy()
    wav = audio_util.SP_to_wav(alpha2.astype(np.float64), cm, cp)
    return wav / np.sqrt(np.mean(wav ** 2)) * 0.03


def _load_toy():
    import scipy.io.wavfile as wavfile
    _, c = wavfile.read(
        "/root/reference/toy_dataset/Train/Clean/f_hvd_100#Babble#-11.wav")
    _, n = wavfile.read(
        "/root/reference/toy_dataset/Train/Noise/f_hvd_100#Babble#-11.wav")
    return (c.astype(np.float64) / 32768.0, n.astype(np.float64) / 32768.0)


@pytest.mark.smoke
def test_enhance_utterance_matches_reference(gen_params):
    g_ref, params = gen_params
    clean, noise = _load_toy()
    ref_wav = _ref_enhance(g_ref, clean, noise)
    ours = np.asarray(pipeline.enhance_utterance(
        params, clean.astype(np.float32), noise.astype(np.float32)))
    assert ours.shape == ref_wav.shape
    # f32 network vs f32 reference network; DSP in f32 vs f64 -> ~1e-4 audio
    err = np.abs(ours - ref_wav)
    assert err.max() < 5e-4, err.max()
    np.testing.assert_allclose(np.sqrt(np.mean(ours ** 2)), 0.03, rtol=1e-5)


def test_enhance_batch_matches_single(gen_params):
    _, params = gen_params
    clean, noise = _load_toy()
    # two different lengths in one bucket
    c1, n1 = clean[:30000], noise[:30000]
    c2, n2 = clean, noise
    cp, lens = pipeline.reflect_pad_batch([c1, c2])
    np_, _ = pipeline.reflect_pad_batch([n1, n2])
    feats = pipeline.featurize_batch(cp, np_, lens)
    wavs, alpha2, out_lens = pipeline.enhance_batch(params, feats)

    for i, (c, n) in enumerate([(c1, n1), (c2, n2)]):
        single = np.asarray(pipeline.enhance_utterance(
            params, c.astype(np.float32), n.astype(np.float32)))
        m = int(out_lens[i])
        assert m == len(single)
        np.testing.assert_allclose(np.asarray(wavs[i, :m]), single,
                                   rtol=1e-3, atol=2e-5)
        tail = np.asarray(wavs[i, m:])
        assert tail.size == 0 or np.abs(tail).max() == 0.0


def test_enhance_batch_silent_row_is_finite():
    """An all-zero utterance row must come out zero, not NaN (the RMS
    denominator is exactly 0 there)."""
    import jax
    import numpy as np
    from nelegan_tpu.config import Config
    from nelegan_tpu.models.generator import Generator
    from nelegan_tpu import pipeline
    cfg = Config()
    rng = np.random.RandomState(0)
    wavs = [(0.03 * rng.randn(8192)).astype(np.float32),
            np.zeros(8192, np.float32)]
    noises = [(0.01 * rng.randn(8192)).astype(np.float32),
              np.zeros(8192, np.float32)]
    cp, lens = pipeline.reflect_pad_batch(wavs)
    npd, _ = pipeline.reflect_pad_batch(noises)
    params = Generator().init(
        jax.random.PRNGKey(0), np.zeros((1, 8, 64), np.float32),
        np.zeros((1, 8, 64), np.float32))["params"]
    feats = pipeline.featurize_batch(cp, npd, lens, cfg.train.p_power)
    wav, _, _ = pipeline.enhance_batch(params, feats, cfg.train.p_power,
                                       cfg.train.target_rms)
    out = np.asarray(wav)
    assert np.isfinite(out).all()
    assert np.abs(out[1]).max() == 0.0


def test_pcm16_quantize_matches_disk_round_trip(tmp_path):
    """pcm16_quantize must be bit-exact vs write_wav_pcm16 + read_wav
    (clip, x32768, clamp 32767, round half away from zero — the pool's
    enhanced-band insertion relies on this, train/loop.py)."""
    from nelegan_tpu.data.wavio import read_wav, write_wav_pcm16
    rng = np.random.RandomState(1)
    w = np.concatenate([
        0.2 * rng.randn(5000),
        [1.5, -1.5, 1.0, -1.0, 32767.4 / 32768, 32767.6 / 32768,
         -32768.4 / 32768, 0.5 / 32768, -0.5 / 32768],
    ]).astype(np.float32)
    p = str(tmp_path / "q.wav")
    write_wav_pcm16(p, w)
    back, _ = read_wav(p)
    q = np.asarray(pipeline.pcm16_quantize(w))
    np.testing.assert_array_equal(q, back)


def test_reflect_pad_device_matches_host():
    rng = np.random.RandomState(2)
    n = 5000
    for length in (300, 1024, 4999, 5000):
        w = (0.1 * rng.randn(length)).astype(np.float32)
        host, _ = pipeline.reflect_pad_batch([w], n)
        dev_in = np.zeros((1, n), np.float32)
        dev_in[0, :length] = w
        dev = np.asarray(pipeline.reflect_pad_device(
            dev_in, np.array([length], np.int32)))
        np.testing.assert_array_equal(host, dev)


def test_eband_from_enhanced_matches_file_path(tmp_path):
    """The pool row inserted at enhance time must equal the row the D pass
    would have computed from the written file."""
    import jax
    from nelegan_tpu.config import Config
    from nelegan_tpu.data.wavio import read_wav, write_wav_pcm16
    from nelegan_tpu.train import gan

    cfg = Config()
    rng = np.random.RandomState(3)
    lens = [7000, 8192]
    wavs = [(0.03 * rng.randn(n)).astype(np.float32) for n in lens]
    noises = [(0.01 * rng.randn(n)).astype(np.float32) for n in lens]
    cp, lengths = pipeline.reflect_pad_batch(wavs, 8192)
    npad, _ = pipeline.reflect_pad_batch(noises, 8192)
    params = Generator().init(
        jax.random.PRNGKey(0), np.zeros((1, 8, 64), np.float32),
        np.zeros((1, 8, 64), np.float32))["params"]
    feats = pipeline.featurize_batch(cp, npad, lengths, cfg.train.p_power)
    wav_dev, _, out_lens = pipeline.enhance_batch(
        params, feats, cfg.train.p_power, cfg.train.target_rms)

    pooled = np.asarray(gan.eband_from_enhanced(wav_dev, out_lens, cfg))

    wavs_np = np.asarray(wav_dev)
    lens_np = np.asarray(out_lens)
    blen = wavs_np.shape[-1]
    enhs = []
    for i in range(len(lens)):
        p = str(tmp_path / f"e{i}.wav")
        write_wav_pcm16(p, wavs_np[i, :lens_np[i]])
        enhs.append(read_wav(p)[0][:blen])
    ep, _ = pipeline.reflect_pad_batch(enhs, blen)
    from_file = np.asarray(gan.speech_band(ep, cfg))

    t_valid = [1 + n // 256 for n in lens_np]
    for i, t in enumerate(t_valid):
        # frames past the valid count are masked downstream; compare the
        # frames the discriminator actually sees
        np.testing.assert_array_equal(pooled[i, :t], from_file[i, :t])


def test_featurize_batch_pcm16_input_bitmatches_f32():
    """int16 (raw PCM16) inputs through reflect_pad_batch + featurize_batch
    must equal the f32 path bit-for-bit: reflect padding only copies
    samples, and the on-device conversion (x / 32768) is the host
    decoder's formula (data/wavio.py).  The PCM16 transfer path halves
    host->device bytes — the enhancement pipeline's bottleneck on
    tunnel-attached devices."""
    import numpy as np
    from nelegan_tpu import pipeline
    rng = np.random.RandomState(7)
    pcm = [rng.randint(-32768, 32768, n).astype(np.int16)
           for n in (8192, 6000)]
    f32 = [p.astype(np.float32) / 32768.0 for p in pcm]
    noise16 = [rng.randint(-2048, 2048, len(p)).astype(np.int16)
               for p in pcm]
    noise32 = [p.astype(np.float32) / 32768.0 for p in noise16]

    cp16, lens16 = pipeline.reflect_pad_batch(pcm)
    cp32, lens32 = pipeline.reflect_pad_batch(f32)
    assert cp16.dtype == np.int16 and cp32.dtype == np.float32
    np.testing.assert_array_equal(lens16, lens32)
    np16, _ = pipeline.reflect_pad_batch(noise16)
    np32, _ = pipeline.reflect_pad_batch(noise32)

    a = pipeline.featurize_batch(cp16, np16, lens16)
    b = pipeline.featurize_batch(cp32, np32, lens32)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pcm16_quantize_i16_writes_identical_files(tmp_path):
    """Fetching device-quantized int16 (pcm16_quantize_i16) and writing it
    raw must produce byte-identical files to the f32 fetch + host
    quantization path — including clipping and round-half-away ties."""
    import numpy as np
    from nelegan_tpu import pipeline
    from nelegan_tpu.data.wavio import write_wav_pcm16, read_wav
    rng = np.random.RandomState(3)
    wav = np.concatenate([
        rng.randn(4096).astype(np.float32) * 0.4,
        np.array([1.5, -1.5, 1.0, -1.0,                # clipping
                  0.5 / 32768, -0.5 / 32768,           # round-half ties
                  32766.5 / 32768, -32767.5 / 32768],
                 np.float32)])
    f32_path = str(tmp_path / "f32.wav")
    i16_path = str(tmp_path / "i16.wav")
    write_wav_pcm16(f32_path, wav)
    q = np.asarray(pipeline.pcm16_quantize_i16(wav))
    assert q.dtype == np.int16
    write_wav_pcm16(i16_path, q)
    a = open(f32_path, "rb").read()
    b = open(i16_path, "rb").read()
    # audio payloads must match sample for sample (header layout may
    # differ between the native writer and scipy)
    assert a[-2 * len(wav):] == b[-2 * len(wav):]
    wa, _ = read_wav(f32_path)
    wb, _ = read_wav(i16_path)
    np.testing.assert_array_equal(wa, wb)
