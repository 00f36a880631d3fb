"""On-device metric suite replacing the reference's CPU process pools.

The reference fans each metric out over a 32-process joblib pool plus an
external C++ binary (reference: audio_util.py:120-364).  Here every score is
a jitted JAX function; `score_pair` evaluates all five metrics for one
(clean, noise, enhanced) triple on-device, and `score_batch` maps it over a
list (grouped by length to bound recompilation).

Wrapper semantics follow intel.py:
  * intelligibility metrics (SIIB, HASPI, ESTOI) compare clean vs
    enhanced + noise (the near-end listener hears signal plus noise);
  * quality metrics (PESQ, ViSQOL) compare clean vs enhanced;
  * `norm=True` applies the logistic calibrations (intel.py:102-160).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
import numpy as np

from nelegan_tpu.metrics.estoi import estoi  # noqa: F401
from nelegan_tpu.metrics.siib import siib  # noqa: F401
from nelegan_tpu.metrics.haspi import (  # noqa: F401
    haspi_v1, haspi_v2, hasqi_v2,
    haspi_v1_24k, haspi_v2_24k, hasqi_v2_24k,
)
from nelegan_tpu.metrics.quality import pesq_proxy, visqol_proxy  # noqa: F401
from nelegan_tpu.metrics.calibrate import make_mappers, logistic  # noqa: F401

ALL_METRICS = ("siib", "haspi", "estoi", "pesq", "visqol")


def score_pair_async(clean, noise, enhanced, fs: int = 16000,
                     norm: bool = True,
                     metrics: Sequence[str] = ALL_METRICS) -> Dict[str, Any]:
    """Like score_pair but returns 0-d device arrays without fetching —
    callers batch the host transfers (each fetch costs a full round trip
    through the remote-device tunnel)."""
    n = min(len(clean), len(enhanced), len(noise))
    clean = np.asarray(clean)[:n]
    noisy_enh = np.asarray(enhanced)[:n] + np.asarray(noise)[:n]
    enh = np.asarray(enhanced)[:n]
    mappers = make_mappers()

    out: Dict[str, Any] = {}
    for m in metrics:
        if m == "siib":
            raw = siib(clean, noisy_enh, fs)
        elif m == "haspi":
            raw = haspi_v2(clean, fs, noisy_enh, fs)[0]
        elif m == "estoi":
            raw = estoi(clean, noisy_enh, fs)
        elif m == "pesq":
            raw = pesq_proxy(clean, enh, fs)
        elif m == "visqol":
            raw = visqol_proxy(clean, enh, fs)
        else:
            raise ValueError(f"unknown metric {m}")
        out[m] = mappers[m](raw) if norm else raw
    return out


def score_pair(clean: np.ndarray, noise: np.ndarray, enhanced: np.ndarray,
               fs: int = 16000, norm: bool = True,
               metrics: Sequence[str] = ALL_METRICS) -> Dict[str, float]:
    """All requested metrics for one utterance triple.

    Mirrors the per-file logic of reference read_STOI/read_SIIB/read_HASPI/
    read_PESQ (audio_util.py:120-228): signals are trimmed to the shortest,
    intelligibility metrics hear enhanced + noise.
    """
    return {k: float(v) for k, v in
            score_pair_async(clean, noise, enhanced, fs, norm,
                             metrics).items()}


def score_batch(clean_list, noise_list, enhanced_list, fs: int = 16000,
                norm: bool = True,
                metrics: Sequence[str] = ALL_METRICS):
    """Score a corpus: all metric programs are dispatched asynchronously and
    the scalar results fetched in one device->host transfer at the end
    (same-length utterances share jit caches)."""
    import jax.numpy as jnp
    pending = [score_pair_async(c, n, e, fs, norm, metrics)
               for c, n, e in zip(clean_list, noise_list, enhanced_list)]
    if not pending:
        return []
    keys = list(pending[0].keys())
    flat = jnp.stack([jnp.stack([jnp.asarray(p[k], jnp.float32)
                                 for k in keys]) for p in pending])
    vals = np.asarray(flat)  # single fetch
    return [{k: float(vals[i, j]) for j, k in enumerate(keys)}
            for i in range(len(pending))]
