"""Property tests for ESTOI / SIIB / quality proxies (no external oracle
exists in this environment; pystoi/pysiib/pypesq are unavailable, so these
check the published algorithms' defining properties instead)."""
import numpy as np
import pytest
import scipy.io.wavfile as wavfile

from nelegan_tpu.metrics import (estoi, siib, pesq_proxy, visqol_proxy,
                                 score_pair)


@pytest.fixture(scope="module")
def toy():
    _, c = wavfile.read(
        "/root/reference/toy_dataset/Train/Clean/f_hvd_100#Babble#-11.wav")
    _, n = wavfile.read(
        "/root/reference/toy_dataset/Train/Noise/f_hvd_100#Babble#-11.wav")
    return (c / 32768.0).astype(np.float64), (n / 32768.0).astype(np.float64)


def test_estoi_self_is_one(toy):
    clean, _ = toy
    assert abs(float(estoi(clean, clean, 16000)) - 1.0) < 1e-6


def test_estoi_monotone_in_snr(toy):
    clean, noise = toy
    scores = [float(estoi(clean, clean + g * noise, 16000))
              for g in [0.0, 0.3, 1.0, 3.0]]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[-1] < 0.6


def test_estoi_scale_invariant(toy):
    clean, noise = toy
    a = float(estoi(clean, clean + noise, 16000))
    b = float(estoi(clean * 5.0, (clean + noise) * 0.2, 16000))
    assert abs(a - b) < 1e-4


def test_siib_monotone_in_snr(toy):
    clean, noise = toy
    scores = [float(siib(clean, clean + g * noise, 16000))
              for g in [0.1, 1.0, 3.0]]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 20.0           # near-clean should be intelligible
    assert scores[-1] < scores[0] / 2


def test_pesq_proxy_ordering(toy):
    clean, noise = toy
    self_score = float(pesq_proxy(clean, clean))
    light = float(pesq_proxy(clean, clean + 0.1 * noise))
    heavy = float(pesq_proxy(clean, clean + 2.0 * noise))
    assert self_score > light > heavy
    assert self_score > 4.3
    assert -0.5 <= heavy <= 4.6  # raw ITU P.862 range


def test_visqol_proxy_ordering(toy):
    clean, noise = toy
    self_score = float(visqol_proxy(clean, clean))
    light = float(visqol_proxy(clean, clean + 0.1 * noise))
    heavy = float(visqol_proxy(clean, clean + 2.0 * noise))
    assert self_score > light > heavy
    assert self_score > 4.5


@pytest.mark.smoke
def test_score_pair_all_metrics(toy):
    clean, noise = toy
    scores = score_pair(clean, noise, clean, norm=True,
                        metrics=("estoi", "pesq", "visqol"))
    for k, v in scores.items():
        assert 0.0 <= v <= 1.0, (k, v)
