"""Property tests for the full-structure ViSQOL speech-mode model.

No ViSQOL binary exists in this environment, so these check the defining
behaviors: perfect score on identity, monotone degradation, *patch-
alignment* robustness to time shifts (the mechanism a plain global-NSIM
surrogate lacks), padded-batch equivalence, and vmap consistency.
"""
import numpy as np
import pytest
import scipy.io.wavfile as wavfile

import jax
import jax.numpy as jnp

from nelegan_tpu.metrics.visqol import visqol_speech, visqol_speech_16k


@pytest.fixture(scope="module")
def toy():
    _, c = wavfile.read(
        "/root/reference/toy_dataset/Train/Clean/f_hvd_100#Babble#-11.wav")
    _, n = wavfile.read(
        "/root/reference/toy_dataset/Train/Noise/f_hvd_100#Babble#-11.wav")
    return (c / 32768.0).astype(np.float32), (n / 32768.0).astype(np.float32)


def test_self_score_near_ceiling(toy):
    clean, _ = toy
    s = float(visqol_speech(clean, clean))
    assert 4.5 < s <= 4.731  # f32 round-up of the 4.73 identity ceiling


def test_monotone_in_noise(toy):
    clean, noise = toy
    scores = [float(visqol_speech(clean, clean + g * noise))
              for g in [0.02, 0.1, 0.3, 1.0]]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.5      # ~34 dB SNR: good (fitted map, see visqol.py)
    assert scores[-1] < 2.0     # 0 dB SNR: bad


def test_patch_alignment_absorbs_shift(toy):
    """ViSQOL's patch alignment makes scores robust to constant delay.

    An integer-hop delay must align exactly (ceiling score); a sub-frame
    residual (100 ms = 6.25 hops) smears the STFT slightly, and the fitted
    exp map is steepest near NSIM=1, so it only needs to stay high."""
    clean, _ = toy
    hop_aligned = np.concatenate([np.zeros(1536, np.float32), clean[:-1536]])
    s_exact = float(visqol_speech(clean, hop_aligned))
    assert s_exact > 4.7, s_exact
    shifted = np.concatenate([np.zeros(1600, np.float32), clean[:-1600]])
    s = float(visqol_speech(clean, shifted))
    assert s > 4.0, s


def test_padded_matches_trimmed(toy):
    clean, noise = toy
    deg = (clean + 0.2 * noise).astype(np.float32)
    exact = float(visqol_speech(clean, deg))
    m = len(clean)
    ref_p = np.zeros(m + 9000, np.float32)
    deg_p = np.zeros(m + 9000, np.float32)
    ref_p[:m], deg_p[:m] = clean, deg
    padded = float(visqol_speech_16k(jnp.asarray(ref_p), jnp.asarray(deg_p),
                                     n_valid=jnp.asarray(m)))
    assert abs(exact - padded) < 0.02, (exact, padded)


def test_vmap_matches_loop(toy):
    clean, noise = toy
    m = len(clean)
    refs = jnp.asarray(np.stack([clean, clean]))
    degs = jnp.asarray(np.stack([clean + 0.05 * noise,
                                 clean + 0.5 * noise]))
    nv = jnp.asarray([m, m], jnp.int32)
    batched = np.asarray(jax.vmap(visqol_speech_16k)(refs, degs, nv))
    single = [float(visqol_speech_16k(refs[i], degs[i], jnp.asarray(m)))
              for i in range(2)]
    np.testing.assert_allclose(batched, single, atol=1e-4)


def test_short_clips_score(toy):
    """Sub-patch (< 30 frame) clips must score via the first-patch
    fallback instead of crashing / collapsing to the floor (regression)."""
    clean, noise = toy
    short = clean[:4000]
    s_self = float(visqol_speech(short, short))
    s_deg = float(visqol_speech(short, short + 0.5 * noise[:4000]))
    assert s_self > 4.3
    assert s_deg < s_self
    # and the same short clip inside a padded bucket scores identically
    pad = np.zeros(16384, np.float32)
    a, b = pad.copy(), pad.copy()
    a[:4000], b[:4000] = short, short + 0.5 * noise[:4000]
    s_bucket = float(visqol_speech_16k(jnp.asarray(a), jnp.asarray(b),
                                       n_valid=jnp.asarray(4000)))
    assert abs(s_bucket - s_deg) < 0.02, (s_bucket, s_deg)
