"""Measure data-parallel vs tensor-parallel step throughput (VERDICT r1 #7).

Times jitted G+D steps at a FIXED global batch on the virtual 8-device CPU
mesh under (data=8, model=1) and (data=4, model=2) layouts.  Run:

    python tools/measure_tp.py

The committed result lives in parallel/mesh.py's docstring; re-run this on
a real multi-chip pod before trusting TP with real ICI latencies.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from nelegan_tpu.config import Config
    from nelegan_tpu.parallel.mesh import (make_mesh, shard_batch,
                                           shard_params, replicate)
    from nelegan_tpu.train import gan
    from nelegan_tpu import pipeline

    cfg = Config()
    rng = np.random.RandomState(0)
    b, n = 8, 16384
    clean, lens = pipeline.reflect_pad_batch(
        [(0.03 * rng.randn(n)).astype(np.float32) for _ in range(b)])
    noise, _ = pipeline.reflect_pad_batch(
        [(0.03 * rng.randn(n)).astype(np.float32) for _ in range(b)])
    cb, nb, fr = map(np.asarray, gan.featurize_bands(clean, noise, lens,
                                                     cfg))
    img3, img2, frames = map(np.asarray, gan.featurize_triple(
        clean, noise, clean, lens, cfg))
    tg = np.full((b, 3), 0.7, np.float32)
    tq = np.full((b, 2), 0.7, np.float32)

    results = {}
    for mp in (1, 2):
        mesh = make_mesh(8, model_parallel=mp)
        state = gan.init_train_state(jax.random.PRNGKey(0), cfg)
        state = state._replace(
            gen_params=shard_params(mesh, state.gen_params),
            gen_opt=shard_params(mesh, state.gen_opt),
            d_params=shard_params(mesh, state.d_params),
            d_opt=shard_params(mesh, state.d_opt),
            dq_params=shard_params(mesh, state.dq_params),
            dq_opt=shard_params(mesh, state.dq_opt),
            d_spectral=replicate(mesh, state.d_spectral),
            dq_spectral=replicate(mesh, state.dq_spectral),
        )
        a = shard_batch(mesh, (cb, nb, fr, img3, img2, frames, tg, tq))
        cb_s, nb_s, fr_s, i3, i2, frm, tg_s, tq_s = a

        state, gl = gan.g_step_bands(state, cb_s, nb_s, fr_s, cfg)
        state, dl, ql = gan.d_step(state, i3, i2, frm, tg_s, tq_s, cfg)
        float(gl); float(dl)  # settle
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            state, gl = gan.g_step_bands(state, cb_s, nb_s, fr_s, cfg)
            state, dl, ql = gan.d_step(state, i3, i2, frm, tg_s, tq_s, cfg)
        _ = float(gl) + float(dl)
        dt = (time.perf_counter() - t0) / iters
        results[mp] = dt
        print(f"mesh data={8 // mp} x model={mp}: "
              f"{1000 * dt:.1f} ms / G+D step (global batch {b})")

    speedup = results[2] / results[1]
    print(f"tp2 is {speedup:.2f}x the dp-only step time "
          f"({'dp wins' if speedup > 1 else 'tp wins'})")


if __name__ == "__main__":
    main()
