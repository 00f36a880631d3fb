"""Spectral normalization with torch-compatible power iteration.

The reference wraps every discriminator layer in
`torch.nn.utils.spectral_norm` (reference: model.py:105-116,139-150).  Torch
semantics reproduced exactly:

  * the weight matrix is flattened to [out, -1] in (in, kh, kw) order;
  * one power-iteration step per *training* forward updates the stored
    (u, v) vectors (eps=1e-12 l2-normalisation);
  * eval mode reuses the stored u, v without updating;
  * the layer computes with weight / sigma, sigma = u^T W v.

In flax, (u, v) live in a mutable "spectral" variable collection; training
steps apply the module with `mutable=["spectral"]`.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

_EPS = 1e-12


def _l2norm(v: jnp.ndarray) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v), _EPS)


def _spectral_weight(module: nn.Module, wmat: jnp.ndarray, update: bool):
    """Returns sigma given the [out, prod(rest)] matrix; manages (u, v)."""
    out_dim, in_dim = wmat.shape
    u_var = module.variable(
        "spectral", "u",
        lambda: _l2norm(jax.random.normal(module.make_rng("params")
                                          if module.has_rng("params")
                                          else jax.random.PRNGKey(0),
                                          (out_dim,), wmat.dtype)))
    # v starts one half power-iteration from u (NOT zeros: an eval-mode
    # forward before any training step computes sigma = u @ (W @ v), and a
    # zero v would divide the weight by zero — torch's random init also
    # stays finite on the eval-before-train path)
    v_var = module.variable(
        "spectral", "v", lambda: _l2norm(wmat.T @ u_var.value))

    u, v = u_var.value, v_var.value
    if update:
        v = _l2norm(wmat.T @ u)
        u = _l2norm(wmat @ v)
        u_var.value = jax.lax.stop_gradient(u)
        v_var.value = jax.lax.stop_gradient(v)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
    sigma = u @ (wmat @ v)
    return sigma


class SNConv2D(nn.Module):
    """Conv2D (NHWC, VALID padding) with spectral-normalised weight.

    `dtype` (None = compute in the input/param dtype untouched, preserving
    f64 parity runs) is a reduced computation dtype for the convolution
    itself (bf16 under the mixed-precision policy); the weight, bias, and
    the power iteration (sigma) ALWAYS stay in the param dtype — sigma
    divides the whole kernel, so bf16 error there would scale every
    output, and (u, v) drift compounds across steps."""
    features: int
    kernel: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_sn: bool = False) -> jnp.ndarray:
        k = self.kernel
        in_ch = x.shape[-1]
        pdt = jnp.promote_types(x.dtype, jnp.float32)  # params >= f32
        w = self.param("weight_orig", nn.initializers.he_uniform(),
                       (k, k, in_ch, self.features), pdt)
        b = self.param("bias", nn.initializers.zeros, (self.features,), pdt)
        # torch flattening order: [out, in, kh, kw] -> [out, -1]
        wmat = jnp.transpose(w, (3, 2, 0, 1)).reshape(self.features, -1)
        sigma = _spectral_weight(self, wmat, update_sn)
        w_sn = w / sigma
        if self.dtype is not None:
            x, w_sn, b = (x.astype(self.dtype), w_sn.astype(self.dtype),
                          b.astype(self.dtype))
        y = jax.lax.conv_general_dilated(
            x, w_sn, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b


class SNDense(nn.Module):
    """Dense layer with spectral-normalised weight (see SNConv2D re dtype)."""
    features: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_sn: bool = False) -> jnp.ndarray:
        in_dim = x.shape[-1]
        pdt = jnp.promote_types(x.dtype, jnp.float32)  # params >= f32
        w = self.param("weight_orig", nn.initializers.he_uniform(),
                       (in_dim, self.features), pdt)
        b = self.param("bias", nn.initializers.zeros, (self.features,), pdt)
        wmat = w.T  # torch layout [out, in]
        sigma = _spectral_weight(self, wmat, update_sn)
        w_sn = w / sigma
        if self.dtype is not None:
            x, w_sn, b = (x.astype(self.dtype), w_sn.astype(self.dtype),
                          b.astype(self.dtype))
        return x @ w_sn + b
