"""Spectral-gain generator: causal Conv1D stack with cumulative LayerNorm.

TPU-native re-design of the reference `Generator_Conv1D_cLN`
(reference: model.py:43-98).  Differences from the torch original are purely
architectural-idiom, not behavioral:

  * layout is [B, T, C] (channels-last — TPU lane dimension) throughout; the
    reference's transpose/chomp dance disappears;
  * "pad (k-1) both sides then right-chomp (k-1)" becomes a causal conv with
    left padding (k-1, 0) — identical function, one op;
  * the cumulative LayerNorm's running statistics are `cumsum`s (already the
    reference's trick, model.py:188-205) which XLA fuses with the conv
    epilogue instead of materialising [B, T] intermediates.

Because every op is causal, right-padded batches are exact: outputs at valid
frames are independent of padding, enabling real (bucketed) batch training
where the reference was locked to batch_size=1 (dataloader.py:90).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class CumulativeLayerNorm(nn.Module):
    """Causal (cumulative-over-time) layer norm, reference model.py:168-205.

    Statistics are ALWAYS accumulated in float32 — cumsum over T*C bf16
    terms loses whole frames of precision — then the normalised result is
    returned in the input dtype (bf16 trunks stay bf16)."""
    features: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        # stats dtype: at least f32 (bf16 trunks), untouched for f32/f64
        sd = jnp.promote_types(x.dtype, jnp.float32)
        gain = self.param("gain", nn.initializers.ones, (self.features,), sd)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), sd)
        c = x.shape[-1]
        t = x.shape[-2]
        x32 = x.astype(sd)
        cum_sum = jnp.cumsum(jnp.sum(x32, axis=-1), axis=-1)        # [B, T]
        cum_pow = jnp.cumsum(jnp.sum(x32 * x32, axis=-1), axis=-1)  # [B, T]
        cnt = (c * jnp.arange(1, t + 1)).astype(sd)
        mean = cum_sum / cnt
        var = (cum_pow - 2.0 * mean * cum_sum) / cnt + mean * mean
        inv_std = 1.0 / jnp.sqrt(var + self.eps)
        y = (x32 - mean[..., None]) * inv_std[..., None]
        return (y * gain + bias).astype(x.dtype)


class CausalConv(nn.Module):
    """1-D causal conv over time, channels-last.

    Equivalent to the reference's ConvNorm(pad=k-1) + Chomp1d(k-1)
    (model.py:10-40): output frame t sees inputs t-k+1 .. t only.
    """
    features: int
    kernel: int
    w_gain: float = 1.0  # xavier-uniform gain (reference: model.py:23-24)
    # None = compute in the input/param dtype (flax default promotion);
    # bf16 under the mixed-precision policy (params stay f32)
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        def xavier_uniform(key, shape, dtype):
            fan_in = shape[0] * shape[1]
            fan_out = shape[0] * shape[2]
            a = self.w_gain * (6.0 / (fan_in + fan_out)) ** 0.5
            import jax
            return jax.random.uniform(key, shape, dtype, -a, a)

        conv = nn.Conv(self.features, (self.kernel,),
                       padding=[(self.kernel - 1, 0)],
                       kernel_init=xavier_uniform,
                       dtype=self.dtype, param_dtype=jnp.float32)
        return conv(x)


class Generator(nn.Module):
    """clean/noise band features -> per-band energy gain mask alpha^2.

    forward([B,T,64] clean, [B,T,64] noise) -> [B,T,64] in
    [exp(-mask_bound), exp(mask_bound)] (reference: model.py:83-98).

    Construct via `Generator.from_config(cfg.model)` anywhere a Config is in
    scope so hyperparameters stay consistent across init/train/inference.
    """
    hidden: int = 256
    n_bands: int = 64
    n_blocks: int = 6
    leaky_slope: float = 0.3
    mask_bound: float = 3.2
    kernel_first: int = 5
    kernel_mid: int = 7
    kernel_last: int = 5
    # Trunk activation dtype ("float32"/"bfloat16", config.ModelConfig
    # .compute_dtype).  Params, cLN statistics, and the output mask stay
    # float32 regardless.
    compute_dtype: str = "float32"

    @classmethod
    def from_config(cls, model_cfg) -> "Generator":
        return cls(hidden=model_cfg.gen_hidden, n_bands=model_cfg.n_bands,
                   n_blocks=model_cfg.gen_blocks,
                   leaky_slope=model_cfg.leaky_slope,
                   mask_bound=model_cfg.mask_bound,
                   kernel_first=model_cfg.gen_kernel_first,
                   kernel_mid=model_cfg.gen_kernel_mid,
                   kernel_last=model_cfg.gen_kernel_last,
                   compute_dtype=getattr(model_cfg, "compute_dtype",
                                         "float32"))

    @nn.compact
    def __call__(self, clean: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        # None = flax default promotion: f32 stays f32, f64 parity runs
        # stay f64; only an explicit reduced policy ("bfloat16") casts
        cd = (None if self.compute_dtype == "float32"
              else jnp.dtype(self.compute_dtype))
        lrelu = lambda v: nn.leaky_relu(v, self.leaky_slope)
        x = jnp.concatenate([clean, noise], axis=-1)  # [B, T, 128]
        if cd is not None:
            x = x.astype(cd)

        x = CausalConv(self.hidden, self.kernel_first, w_gain=5.0 / 3.0,
                       dtype=cd, name="block0_conv")(x)
        x = CumulativeLayerNorm(self.hidden, name="block0_cln")(x)
        x = lrelu(x)
        for i in range(1, self.n_blocks - 1):
            x = CausalConv(self.hidden, self.kernel_mid, w_gain=5.0 / 3.0,
                           dtype=cd, name=f"block{i}_conv")(x)
            x = CumulativeLayerNorm(self.hidden, name=f"block{i}_cln")(x)
            x = lrelu(x)
        x = CausalConv(self.n_bands, self.kernel_last, w_gain=1.0,
                       dtype=cd, name=f"block{self.n_blocks - 1}_conv")(x)
        x = CumulativeLayerNorm(self.n_bands,
                                name=f"block{self.n_blocks - 1}_cln")(x)
        x = lrelu(x)

        x = lrelu(nn.Dense(self.n_bands, dtype=cd, name="fc1")(x))
        x = nn.Dense(self.n_bands, dtype=cd, name="fc2")(x)
        # exp(bound*tanh) in >= f32: the mask feeds beta^2 energy sums
        x = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        return jnp.exp(self.mask_bound * jnp.tanh(x))
