"""Mixed-precision (compute_dtype="bfloat16") policy checks.

The policy (config.ModelConfig.compute_dtype) stores trunk activations in
bf16 while params, cLN statistics, spectral-norm power iteration, pool
reductions, and model outputs stay float32 — so the parameter pytree (and
therefore checkpoints and the torch converter) is IDENTICAL across
policies, and only activation rounding differs.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nelegan_tpu.config import Config, ModelConfig
from nelegan_tpu.models.generator import Generator
from nelegan_tpu.models.discriminator import IntelDiscriminator
from nelegan_tpu.train import gan


@pytest.fixture(scope="module")
def cfgs():
    c32 = Config()
    c16 = dataclasses.replace(
        c32, model=dataclasses.replace(c32.model, compute_dtype="bfloat16"))
    return c32, c16


@pytest.fixture(scope="module")
def bands():
    rng = np.random.default_rng(0)
    b, t = 4, 96
    cb = jnp.asarray(np.abs(rng.standard_normal((b, t, 64))) * 0.1,
                     jnp.float32)
    nb = jnp.asarray(np.abs(rng.standard_normal((b, t, 64))) * 0.05,
                     jnp.float32)
    frames = jnp.full((b,), t, jnp.int32)
    return cb, nb, frames


def test_param_tree_identical(cfgs, bands):
    c32, c16 = cfgs
    cb, nb, _ = bands
    p32 = Generator.from_config(c32.model).init(
        jax.random.PRNGKey(0), cb, nb)["params"]
    p16 = Generator.from_config(c16.model).init(
        jax.random.PRNGKey(0), cb, nb)["params"]
    assert jax.tree_util.tree_structure(p32) == \
        jax.tree_util.tree_structure(p16)
    for a, b_ in zip(jax.tree.leaves(p32), jax.tree.leaves(p16)):
        assert a.dtype == jnp.float32 and b_.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_generator_bf16_close_and_f32_out(cfgs, bands):
    c32, c16 = cfgs
    cb, nb, _ = bands
    p = Generator.from_config(c32.model).init(
        jax.random.PRNGKey(0), cb, nb)["params"]
    m32 = Generator.from_config(c32.model).apply({"params": p}, cb, nb)
    m16 = Generator.from_config(c16.model).apply({"params": p}, cb, nb)
    assert m16.dtype == jnp.float32
    rel = np.abs(np.asarray(m16) - np.asarray(m32)) / np.asarray(m32)
    # bf16 has ~3 decimal digits; exp(3.2*tanh) amplifies trunk rounding.
    # Measured on random init: mean ~1%, max ~8%.
    assert float(np.mean(rel)) < 0.03, float(np.mean(rel))
    assert float(np.max(rel)) < 0.25, float(np.max(rel))


def test_discriminator_bf16_runs_f32_head(cfgs, bands):
    c32, c16 = cfgs
    cb, nb, frames = bands
    img = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (4, 64, 96, 3)).astype(np.float32) * 0.1)
    v = IntelDiscriminator.from_config(c32.model).init(
        jax.random.PRNGKey(1), img)
    s32 = IntelDiscriminator.from_config(c32.model).apply(v, img, frames)
    s16 = IntelDiscriminator.from_config(c16.model).apply(v, img, frames)
    assert s16.dtype == jnp.float32
    assert float(np.max(np.abs(np.asarray(s32) - np.asarray(s16)))) < 0.02


@pytest.mark.smoke
def test_bf16_gan_step_trains():
    """One G step + one D step under the bf16 policy: finite losses,
    finite f32 param updates, spectral (u, v) advance in f32.

    Policy invariants (dtype placement, f32 param tree) are independent
    of model size, so the smoke tier runs them on the small config from
    test_smoke_train — compiling the full production model here cost the
    tier ~45 s of its 1-core compile budget; the full-size bf16-vs-f32
    parity checks above stay in the default tier."""
    c16 = Config(model=ModelConfig(
        gen_hidden=32, gen_blocks=2, disc_channels=(4, 8),
        disc_kernels=(1, 3), compute_dtype="bfloat16"))
    rng = np.random.default_rng(0)
    b, t = 2, 40
    cb = jnp.asarray(np.abs(rng.standard_normal((b, t, 64))) * 0.1,
                     jnp.float32)
    nb = jnp.asarray(np.abs(rng.standard_normal((b, t, 64))) * 0.05,
                     jnp.float32)
    frames = jnp.full((b,), t, jnp.int32)
    state = gan.init_train_state(jax.random.PRNGKey(0), c16)
    state1, gl = gan.g_step_bands(state, cb, nb, frames, c16)
    img3, img2 = gan.d_images(cb, nb, cb, frames)
    tg = jnp.full((b, 3), 0.7, jnp.float32)
    tq = jnp.full((b, 2), 0.7, jnp.float32)
    state2, dl, ql = gan.d_step(state1, img3, img2, frames, tg, tq, c16)
    for val in (gl, dl, ql):
        assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(state2.gen_params):
        assert leaf.dtype == jnp.float32
        assert bool(np.isfinite(np.asarray(leaf)).all())
    for leaf in jax.tree.leaves(state2.d_spectral):
        assert leaf.dtype == jnp.float32
    # params actually moved
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.gen_params),
                        jax.tree.leaves(state2.gen_params)))
    assert moved
