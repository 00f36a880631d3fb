"""Quality metrics: full-structure PESQ (P.862) and a ViSQOL-like surrogate.

The reference scores quality with two *external native* engines: the pypesq
C extension (reference: intel.py:9,142-160) and the ViSQOL C++ executable
shelled out per batch (reference: audio_util.py:232-265).  Neither engine is
vendorable, and the quality discriminator D_Qua only ever consumes their
*calibrated scores* (reference: dataloader.py:75, train_nele.py:152), so a
consistent scorer preserves the training semantics.

  * `pesq_proxy` — now an alias for `nelegan_tpu.metrics.pesq.pesq_p862`,
    a complete on-device ITU-T P.862 perceptual/cognitive model (level
    alignment, WB input filter, Bark warping, frequency & gain
    compensation, Zwicker loudness, masked symmetric/asymmetric
    disturbance, Lpq pooling).  See that module for documented deviations.
  * `visqol_proxy` — NSIM (Neurogram Similarity Index Measure), the core of
    ViSQOL: SSIM-like luminance*structure similarity over gammatone
    spectrogram patches, mapped to MOS-LQO.

If bit-exact external-engine numbers are required for publication tables,
use metrics.oracles (optional imports); training and evaluation inside this
framework use these on-device implementations.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nelegan_tpu.dsp.stft import stft, hann_periodic

FS = 16000
_EPS = 1e-12


def _norm_and_mask(ref, deg, n_valid):
    if n_valid is None:
        ref = ref / jnp.maximum(jnp.sqrt(jnp.mean(ref * ref)), _EPS)
        deg = deg / jnp.maximum(jnp.sqrt(jnp.mean(deg * deg)), _EPS)
        return ref, deg, None
    mask = (jnp.arange(ref.shape[-1]) < n_valid).astype(ref.dtype)
    nv = n_valid.astype(ref.dtype)
    ref = ref * mask / jnp.maximum(
        jnp.sqrt(jnp.sum(ref * ref * mask) / nv), _EPS)
    deg = deg * mask / jnp.maximum(
        jnp.sqrt(jnp.sum(deg * deg * mask) / nv), _EPS)
    # centered-STFT valid frame count (hop 256)
    return ref, deg, 1 + n_valid // 256


# Full P.862 implementation lives in nelegan_tpu.metrics.pesq; these names
# are kept for backward compatibility with earlier revisions' call sites.
from nelegan_tpu.metrics.pesq import (  # noqa: E402
    pesq_p862 as pesq_proxy, pesq_p862_16k as pesq_proxy_16k)


@jax.jit
def visqol_proxy_16k(ref: jnp.ndarray, deg: jnp.ndarray,
                     n_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """NSIM-based ViSQOL-like MOS-LQO in [1, 5] on 16 kHz signals."""
    from nelegan_tpu.metrics.siib import _gammatone_matrix
    dt = ref.dtype
    ref, deg, t_valid = _norm_and_mask(ref, deg, n_valid)
    g = jnp.asarray(_gammatone_matrix(), dt)       # [40, 257]
    nr = 10.0 * jnp.log10(g @ jnp.abs(stft(ref)) ** 2 + 1e-10)  # [40, T]
    nd = 10.0 * jnp.log10(g @ jnp.abs(stft(deg)) ** 2 + 1e-10)
    if t_valid is None:
        lo = jnp.minimum(jnp.min(nr), jnp.min(nd))
        nr = nr - lo
        nd = nd - lo
    else:
        # min/max and the dynamic-range constants must see only valid
        # frames, or an utterance's score would depend on its bucket size
        fm = jnp.arange(nr.shape[-1]) < t_valid
        big = jnp.asarray(1e9, dt)
        lo = jnp.minimum(jnp.min(jnp.where(fm, nr, big)),
                         jnp.min(jnp.where(fm, nd, big)))
        nr = jnp.where(fm, nr - lo, 0.0)
        nd = jnp.where(fm, nd - lo, 0.0)

    # NSIM with a 3x3 smoothing window: luminance * structure
    def smooth(v):
        k = jnp.ones((3, 3), dt) / 9.0
        return jax.lax.conv_general_dilated(
            v[None, :, :, None], k[:, :, None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]

    mu_r, mu_d = smooth(nr), smooth(nd)
    var_r = jnp.maximum(smooth(nr * nr) - mu_r ** 2, 0.0)
    var_d = jnp.maximum(smooth(nd * nd) - mu_d ** 2, 0.0)
    cov = smooth(nr * nd) - mu_r * mu_d
    dyn = jnp.maximum(jnp.max(nr), 1.0)
    c1 = (0.01 * dyn) ** 2
    c3 = (0.03 * dyn) ** 2 / 2.0
    lum = (2.0 * mu_r * mu_d + c1) / (mu_r ** 2 + mu_d ** 2 + c1)
    struct = (cov + c3) / (jnp.sqrt(var_r * var_d) + c3)
    if t_valid is None:
        nsim = jnp.mean(lum * struct)
    else:
        fm2 = (jnp.arange(nr.shape[-1]) < t_valid).astype(dt)[None, :]
        nsim = jnp.sum(lum * struct * fm2) / (nr.shape[0]
                                              * t_valid.astype(dt))
    # map mean NSIM -> MOS-LQO (ViSQOL uses an SVR; affine surrogate here)
    return jnp.clip(1.0 + 4.0 * nsim ** 3, 1.0, 5.0)


def visqol_proxy(ref, deg, fs: int = 16000):
    n = min(ref.shape[-1], deg.shape[-1])
    assert fs == FS, "visqol_proxy expects 16 kHz input"
    return visqol_proxy_16k(jnp.asarray(ref)[..., :n],
                            jnp.asarray(deg)[..., :n])
