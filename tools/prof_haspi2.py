"""Ablation profile of the HASPI v2 degraded-side path (scalar outputs)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from nelegan_tpu.metrics.haspi import (
    haspi_v2_clean_24k, haspi_v2_from_clean_24k, resample_to_24k,
    _rms_normalize_one, _single_side_ear, _tail_mask)
from nelegan_tpu.metrics.haspi.ear_model import (
    center_freq, middle_ear, loss_parameters, _ear_core, group_delay_comp)
from nelegan_tpu.metrics.haspi import chains

rng = np.random.RandomState(0)
n16 = 34000
x = (0.03 * rng.randn(n16)).astype(np.float32)
y = (0.03 * rng.randn(n16)).astype(np.float32)
x24 = np.asarray(resample_to_24k(jnp.asarray(x), 16000))
y24 = np.asarray(resample_to_24k(jnp.asarray(y), 16000))
B = 8
Y = jnp.asarray(np.stack([y24] * B))


def timeit(name, fn, iters=5):
    r = fn()
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    np.asarray(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {1000*dt:8.2f} ms  ({1000*dt/B:.2f}/sig)")
    return dt


def stage(upto):
    def f(sig):
        s = _rms_normalize_one(sig)
        if upto == "norm":
            return jnp.sum(s)
        db, bw = _single_side_ear(s, 65.0, None)
        if upto == "ear":
            return jnp.sum(db) + jnp.sum(bw)
        db = group_delay_comp(db, bw, center_freq())
        if upto == "gd":
            return jnp.sum(db)
        lp = chains.env_filt_one(db, 320.0, 2560.0)
        if upto == "envfilt":
            return jnp.sum(lp)
        return jnp.sum(lp)
    return jax.jit(jax.vmap(f))


for name in ("norm", "ear", "gd", "envfilt"):
    timeit(f"vmap8 upto {name}", lambda s=stage(name): s(Y), iters=3)

# full degraded path (with cached clean side)
cl = jax.tree.map(
    jnp.asarray,
    jax.jit(jax.vmap(lambda a: haspi_v2_clean_24k(a)))(
        jnp.asarray(np.stack([x24] * B))))
full = jax.jit(jax.vmap(lambda b, c: haspi_v2_from_clean_24k(b, c)[0]))
timeit("vmap8 full degraded", lambda: full(Y, cl), iters=3)

# what do the sub-chains cost after the ear (cep_coef + mod_filt_corr)?
lp8 = jax.jit(jax.vmap(lambda s: chains.env_filt_one(
    group_delay_comp(_single_side_ear(_rms_normalize_one(s), 65.0, None)[0],
                     cl["bwx"][0], center_freq()), 320.0, 2560.0)))(Y)
lp8 = jnp.asarray(np.asarray(lp8))


def tail(b_lp, c):
    xc, yc, cnt = chains.cep_coef(c["xlp"], b_lp, 2.5, 0.1, 6,
                                  key=jax.random.PRNGKey(0), noise_scale=0.0)
    return jnp.sum(chains.mod_filt_corr(xc, yc, cnt, 2560.0))


timeit("vmap8 cep+modfilt only", lambda: jax.jit(jax.vmap(tail))(lp8, cl),
       iters=3)
