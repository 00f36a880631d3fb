"""Profile HASPI v2 component costs on the TPU (fetch-timed)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from nelegan_tpu.metrics.haspi import (
    haspi_v2_24k, haspi_v2_clean_24k, haspi_v2_from_clean_24k,
    resample_to_24k)
from nelegan_tpu.metrics.haspi.ear_model import ear_model
from nelegan_tpu.metrics.haspi import chains

rng = np.random.RandomState(0)
n16 = 34000  # ~2.1 s @16k
x = (0.03 * rng.randn(n16)).astype(np.float32)
y = (0.03 * rng.randn(n16)).astype(np.float32)
x24 = resample_to_24k(jnp.asarray(x), 16000)
y24 = resample_to_24k(jnp.asarray(y), 16000)
n24 = x24.shape[-1]
print("n24 =", n24)


def timeit(name, fn, iters=5):
    r = fn()
    jax.tree.map(np.asarray, r)  # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.tree.map(np.asarray, r)  # fetch once; device executes in order
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {1000*dt:8.2f} ms")
    return dt


# full pair path
timeit("haspi_v2_24k (pair)", lambda: haspi_v2_24k(x24, y24)[0])
# split paths
clean = haspi_v2_clean_24k(x24)
clean = jax.tree.map(jnp.asarray, clean)
timeit("haspi_v2_clean_24k", lambda: haspi_v2_clean_24k(x24)["bwx"])
timeit("haspi_v2_from_clean (degraded)",
       lambda: haspi_v2_from_clean_24k(y24, clean)[0])

# components
em = jax.jit(lambda a, b: ear_model(a, b, itype=0, level1=65.0,
                                    noise_scale=0.0))
timeit("ear_model (pair)", lambda: em(x24, y24).xdb)

ear = em(x24, y24)
ear = jax.tree.map(jnp.asarray, ear)
ef = jax.jit(lambda a, b: chains.env_filt(a, b, 320.0, 2560.0))
timeit("env_filt", lambda: ef(jnp.asarray(ear.xdb), jnp.asarray(ear.ydb)))
xlp, ylp = ef(jnp.asarray(ear.xdb), jnp.asarray(ear.ydb))
xlp, ylp = np.asarray(xlp), np.asarray(ylp)

cc = jax.jit(lambda a, b: chains.cep_coef(a, b, 2.5, 0.1, 6,
                                          key=jax.random.PRNGKey(0),
                                          noise_scale=0.0))
timeit("cep_coef", lambda: cc(jnp.asarray(xlp), jnp.asarray(ylp)))
xc, yc, cnt = cc(jnp.asarray(xlp), jnp.asarray(ylp))
xc, yc = np.asarray(xc), np.asarray(yc)

mf = jax.jit(lambda a, b, c: chains.mod_filt_corr(a, b, c, 2560.0))
timeit("mod_filt_corr", lambda: mf(jnp.asarray(xc), jnp.asarray(yc), cnt))

# chunk-batched (vmap 8): the corpus-scoring formulation
X = jnp.asarray(np.stack([np.asarray(x24)] * 8))
Y = jnp.asarray(np.stack([np.asarray(y24)] * 8))
NV = jnp.full((8,), n24, jnp.int32)
pv = jax.jit(jax.vmap(lambda a, b, v: haspi_v2_24k(a, b, n_valid=v)[0]))
dt = timeit("vmap8 pair", lambda: pv(X, Y, NV), iters=3)
print(f"  -> {8/dt:.1f} pair scores/s")
cv = jax.jit(jax.vmap(lambda a, v: haspi_v2_clean_24k(a, n_valid=v)))
cl8 = jax.tree.map(jnp.asarray, cv(X, NV))
dv = jax.jit(jax.vmap(
    lambda b, v, c: haspi_v2_from_clean_24k(b, c, n_valid=v)[0]))
dt = timeit("vmap8 degraded-from-clean", lambda: dv(Y, NV, cl8), iters=3)
print(f"  -> {8/dt:.1f} degraded scores/s")
