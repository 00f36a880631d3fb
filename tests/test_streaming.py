"""Streaming enhancer: exactness vs the offline pipeline.

The claim under test (streaming.py): feeding audio in arbitrary-size chunks
through StreamingEnhancer produces *the same samples* as the offline
featurize -> generator -> resynthesize pipeline evaluated with the causal
(cumulative) beta^2 — because every stage is genuinely causal.
"""
import numpy as np
import pytest
import scipy.io.wavfile as wavfile

import jax
import jax.numpy as jnp

from nelegan_tpu.dsp.features import featurize_speech, featurize_noise, \
    resynthesize
from nelegan_tpu.models.generator import Generator
from nelegan_tpu.streaming import (StreamingEnhancer, streaming_step,
                                   init_stream_state)


@pytest.fixture(scope="module")
def toy():
    _, c = wavfile.read(
        "/root/reference/toy_dataset/Train/Clean/f_hvd_100#Babble#-11.wav")
    _, n = wavfile.read(
        "/root/reference/toy_dataset/Train/Noise/f_hvd_100#Babble#-11.wav")
    return (c / 32768.0).astype(np.float64), (n / 32768.0).astype(np.float64)


@pytest.fixture(scope="module")
def gen_and_params():
    g = Generator()
    params = g.init(jax.random.PRNGKey(7), jnp.zeros((1, 8, 64)),
                    jnp.zeros((1, 8, 64)))["params"]
    return g, params


def offline_causal(clean, noise, g, params, p=1.0 / 6.0):
    """Offline pipeline with the causal (running) beta^2 — un-renormalised."""
    clean_band, mag, phase = featurize_speech(jnp.asarray(clean), p)
    noise_band, _, _ = featurize_noise(jnp.asarray(noise), p)
    mask = g.apply({"params": params}, clean_band[None], noise_band[None])[0]
    cp = clean_band ** (1.0 / p)
    num = jnp.cumsum(jnp.sum(cp, axis=-1))
    den = jnp.cumsum(jnp.sum(mask * cp, axis=-1))
    alpha2 = mask * (num / den)[:, None]
    return np.asarray(resynthesize(alpha2, mag, phase))


def stream_in_chunks(clean, noise, g, params, sizes, chunk_frames=4):
    se = StreamingEnhancer(params, g, chunk_frames=chunk_frames,
                           dtype=np.float64)
    outs, i = [], 0
    k = 0
    while i < len(clean):
        sz = sizes[k % len(sizes)]
        k += 1
        outs.append(se.process(clean[i:i + sz], noise[i:i + sz]))
        i += sz
    outs.append(se.flush())
    return np.concatenate(outs)


def test_stream_matches_offline(toy, gen_and_params):
    clean, noise = toy
    g, params = gen_and_params
    ref = offline_causal(clean, noise, g, params)
    got = stream_in_chunks(clean, noise, g, params,
                           sizes=[300, 1000, 7, 4096, 53])
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, atol=1e-8)


def test_stream_chunksize_invariant(toy, gen_and_params):
    clean, noise = toy
    g, params = gen_and_params
    a = stream_in_chunks(clean, noise, g, params, sizes=[256],
                         chunk_frames=1)
    b = stream_in_chunks(clean, noise, g, params, sizes=[8192],
                         chunk_frames=16)
    np.testing.assert_allclose(a, b, atol=1e-10)


def test_stream_output_length_and_latency(toy, gen_and_params):
    clean, noise = toy
    g, params = gen_and_params
    n = 4096 + 100
    clean, noise = clean[:n], noise[:n]
    se = StreamingEnhancer(params, g, chunk_frames=1, dtype=np.float64)
    emitted_at = {}
    total = 0
    for i in range(0, n, 256):
        out = se.process(clean[i:i + 256], noise[i:i + 256])
        if len(out):
            emitted_at.setdefault(total, i + 256)
            total += len(out)
    total += len(se.flush())
    assert total == 256 * (n // 256)
    # first block (samples [0, 256)) must appear once 512 samples are in
    assert emitted_at[0] == StreamingEnhancer.LATENCY_SAMPLES


def test_stream_final_beta_matches_utterance_beta(toy, gen_and_params):
    """The causal beta^2 converges to the offline utterance-level value."""
    clean, noise = toy
    g, params = gen_and_params
    p = 1.0 / 6.0
    clean_band, _, _ = featurize_speech(jnp.asarray(clean), p)
    noise_band, _, _ = featurize_noise(jnp.asarray(noise), p)
    mask = g.apply({"params": params}, clean_band[None], noise_band[None])[0]
    cp = clean_band ** (1.0 / p)
    beta2_utt = float(jnp.sum(cp) / jnp.sum(mask * cp))

    se = StreamingEnhancer(params, g, chunk_frames=8, dtype=np.float64)
    se.process(clean, noise)
    se.flush()
    beta2_stream = float(se._state.beta_num / se._state.beta_den)
    assert abs(beta2_stream - beta2_utt) / beta2_utt < 1e-10


def test_streaming_step_is_jittable_pytree(gen_and_params):
    g, params = gen_and_params
    st = init_stream_state(g, jnp.float32)
    fc = jnp.zeros((4, 512), jnp.float32)
    new, out = streaming_step(params, st, fc, fc, g)
    assert out.shape == (4, 256)
    assert int(new.frame_idx) == 4


def test_batched_streams_match_independent(toy, gen_and_params):
    """streaming_step_batch advances B streams exactly like B independent
    single-stream runs (the multi-caller serving path)."""
    import jax.numpy as jnp
    from nelegan_tpu.streaming import streaming_step_batch
    clean, noise = toy
    g, params = gen_and_params
    b, f = 3, 4
    fc = np.stack([np.stack([clean[i*256+j*256:i*256+j*256+512]
                             for j in range(f)]) for i in range(b)])
    fn = np.stack([np.stack([noise[i*256+j*256:i*256+j*256+512]
                             for j in range(f)]) for i in range(b)])
    fc = jnp.asarray(fc.astype(np.float64))
    fn = jnp.asarray(fn.astype(np.float64))

    singles = [init_stream_state(g, jnp.float64) for _ in range(b)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *singles)
    new_states, out = streaming_step_batch(params, stacked, fc, fn, g)
    assert out.shape == (b, f, 256)
    for i in range(b):
        st_i, out_i = streaming_step(params, singles[i], fc[i], fn[i], g)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(out_i),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(new_states.beta_num[i]),
                                   np.asarray(st_i.beta_num), rtol=1e-12)
