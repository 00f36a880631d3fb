"""MetricGAN discriminators: spectral-norm conv trunks regressing true metrics.

Re-design of the reference `Discriminator` / `Discriminator_Quality`
(reference: model.py:101-166): five spectral-norm Conv2d layers
(kernels 1/3/5/7/9, VALID padding), global average pooling, and a 3-layer
spectral-norm MLP ending in a sigmoid.  The intelligibility head regresses
(SIIB, HASPI, ESTOI); the quality head regresses (PESQ, ViSQOL).

TPU-first deltas:
  * NHWC layout ([B, 64 bands, T, C_img]);
  * variable-length batching: the global average pool takes a per-sample
    valid-frame count and masks the padded tail (the reference could not
    batch at all, dataloader.py:90);
  * power iteration runs inside the jitted train step via the mutable
    "spectral" collection (see spectral_norm.py).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from nelegan_tpu.models.spectral_norm import SNConv2D, SNDense


class _DiscTrunk(nn.Module):
    out_scores: int
    channels: Tuple[int, ...] = (8, 16, 32, 48, 64)
    kernels: Tuple[int, ...] = (1, 3, 5, 7, 9)
    leaky_slope: float = 0.3
    # Conv-trunk activation dtype (config.ModelConfig.compute_dtype).
    # Params, power iterations, the global pool reduction, and the MLP
    # head + sigmoid stay float32 regardless.
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None,
                 update_sn: bool = False) -> jnp.ndarray:
        # None = compute in the input/param dtype (preserves f64 parity
        # runs); only an explicit reduced policy ("bfloat16") casts
        cd = (None if self.compute_dtype == "float32"
              else jnp.dtype(self.compute_dtype))
        lrelu = lambda v: nn.leaky_relu(v, self.leaky_slope)
        shrink = 0
        for i, (c, k) in enumerate(zip(self.channels, self.kernels)):
            x = SNConv2D(c, k, dtype=cd, name=f"conv{i}")(x, update_sn)
            x = lrelu(x)
            shrink += k - 1

        # global average pool over (bands, time), masking padded frames;
        # the reduction over ~T'*H elements accumulates in >= f32
        x = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        if lengths is None:
            pooled = jnp.mean(x, axis=(1, 2))
        else:
            valid_w = jnp.maximum(lengths - shrink, 1)          # [B]
            t = x.shape[2]
            mask = (jnp.arange(t)[None, :] < valid_w[:, None])  # [B, T']
            mask = mask[:, None, :, None].astype(x.dtype)
            denom = (x.shape[1] * valid_w).astype(x.dtype)
            pooled = jnp.sum(x * mask, axis=(1, 2)) / denom[:, None]

        h = lrelu(SNDense(64, name="fc1")(pooled, update_sn))
        h = lrelu(SNDense(16, name="fc2")(h, update_sn))
        return nn.sigmoid(SNDense(self.out_scores, name="fc3")(h, update_sn))


class IntelDiscriminator(nn.Module):
    """Input [B, 64, T, 3] = (enhanced, noise, clean) band images ->
    [B, n_scores] predicted (SIIB, HASPI, ESTOI) in [0, 1]."""
    leaky_slope: float = 0.3
    channels: Tuple[int, ...] = (8, 16, 32, 48, 64)
    kernels: Tuple[int, ...] = (1, 3, 5, 7, 9)
    n_scores: int = 3
    compute_dtype: str = "float32"

    @classmethod
    def from_config(cls, model_cfg) -> "IntelDiscriminator":
        return cls(leaky_slope=model_cfg.leaky_slope,
                   channels=model_cfg.disc_channels,
                   kernels=model_cfg.disc_kernels,
                   n_scores=model_cfg.n_intel_scores,
                   compute_dtype=getattr(model_cfg, "compute_dtype",
                                         "float32"))

    @nn.compact
    def __call__(self, x, lengths=None, update_sn: bool = False):
        return _DiscTrunk(self.n_scores, channels=self.channels,
                          kernels=self.kernels,
                          leaky_slope=self.leaky_slope,
                          compute_dtype=self.compute_dtype,
                          name="trunk")(x, lengths, update_sn)


class QualityDiscriminator(nn.Module):
    """Input [B, 64, T, 2] = (enhanced, clean) band images ->
    [B, n_scores] predicted (PESQ, ViSQOL) in [0, 1]."""
    leaky_slope: float = 0.3
    channels: Tuple[int, ...] = (8, 16, 32, 48, 64)
    kernels: Tuple[int, ...] = (1, 3, 5, 7, 9)
    n_scores: int = 2
    compute_dtype: str = "float32"

    @classmethod
    def from_config(cls, model_cfg) -> "QualityDiscriminator":
        return cls(leaky_slope=model_cfg.leaky_slope,
                   channels=model_cfg.disc_channels,
                   kernels=model_cfg.disc_kernels,
                   n_scores=model_cfg.n_quality_scores,
                   compute_dtype=getattr(model_cfg, "compute_dtype",
                                         "float32"))

    @nn.compact
    def __call__(self, x, lengths=None, update_sn: bool = False):
        return _DiscTrunk(self.n_scores, channels=self.channels,
                          kernels=self.kernels,
                          leaky_slope=self.leaky_slope,
                          compute_dtype=self.compute_dtype,
                          name="trunk")(x, lengths, update_sn)
