"""Logistic score calibrations mapping raw metrics into [0, 1] GAN targets.

Reference: intel.py:102-160 and audio_util.py:259-262 — each metric's raw
score passes through 1 / (1 + exp(a * (x - b))) before becoming a
discriminator regression target.
"""
from __future__ import annotations

import jax.numpy as jnp

from nelegan_tpu.config import MetricCalibration


def logistic(x, a: float, b: float):
    return 1.0 / (1.0 + jnp.exp(a * (x - b)))


def logistic_np(x, a: float, b: float):
    """Host-side logistic for already-fetched scores (jnp on a Python float
    creates a device scalar whose float() costs a device round trip)."""
    import numpy as np
    return 1.0 / (1.0 + np.exp(a * (np.asarray(x, np.float64) - b)))


def make_mappers_np(calib: MetricCalibration = MetricCalibration()):
    return {name: (lambda x, ab=ab: logistic_np(x, *ab))
            for name, ab in [("siib", calib.siib), ("haspi", calib.haspi),
                             ("estoi", calib.estoi), ("pesq", calib.pesq),
                             ("visqol", calib.visqol)]}


def make_mappers(calib: MetricCalibration = MetricCalibration()):
    return {
        "siib": lambda x: logistic(x, *calib.siib),
        "haspi": lambda x: logistic(x, *calib.haspi),
        "estoi": lambda x: logistic(x, *calib.estoi),
        "pesq": lambda x: logistic(x, *calib.pesq),
        "visqol": lambda x: logistic(x, *calib.visqol),
    }
