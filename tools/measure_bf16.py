"""A/B measure the GAN step under compute_dtype float32 vs bfloat16.

Runs on the default platform (the driver's TPU chip through the axon
tunnel).  Interleaves reps (tunnel service load varies ~10x) and reports
median ms/step per config plus the compiler-estimated FLOPs, answering
round-2 VERDICT item 3: is the GAN step MXU-bound (bf16 helps) or
bandwidth/latency-bound (it won't)?

Usage: python tools/measure_bf16.py [batch] [T]
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

PEAK_FLOPS = 197e12  # v5e bf16


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 132  # ~2.1 s utterance
    from nelegan_tpu.config import Config
    from nelegan_tpu.train import gan

    rng = np.random.default_rng(0)
    cb = jax.device_put(np.abs(rng.standard_normal(
        (b, t, 64))).astype(np.float32) * 0.1)
    nb = jax.device_put(np.abs(rng.standard_normal(
        (b, t, 64))).astype(np.float32) * 0.05)
    frames = jax.device_put(np.full((b,), t, np.int32))
    tg = jax.device_put(np.full((b, 3), 0.7, np.float32))
    tq = jax.device_put(np.full((b, 2), 0.7, np.float32))

    cfgs = {}
    cfg = Config()
    cfgs["float32"] = cfg
    cfgs["bfloat16"] = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"))

    states, flops = {}, {}
    for name, c in cfgs.items():
        st = gan.init_train_state(jax.random.PRNGKey(0), c)
        st = jax.device_put(st)
        img3, img2 = gan.d_images(cb, nb, cb, frames)
        # compile + one settle fetch
        st, gl = gan.g_step_bands(st, cb, nb, frames, c)
        st, dl, ql = gan.d_step(st, img3, img2, frames, tg, tq, c)
        float(gl)
        states[name] = (st, c, img3, img2)
        fg = fd = 0.0
        try:
            fg = float(gan.g_step_bands.lower(
                st, cb, nb, frames, cfg=c).compile().cost_analysis()
                .get("flops", 0.0))
            fd = float(gan.d_step.lower(
                st, img3, img2, frames, tg, tq, cfg=c).compile()
                .cost_analysis().get("flops", 0.0))
        except Exception as e:
            print("cost_analysis failed:", e)
        flops[name] = fg + fd
        print(f"{name}: compiled, flops/step = {flops[name]:.3e}",
              flush=True)

    # interleaved timed reps: [f32, bf16] x NREP, N steps per rep
    NREP, NSTEP = 5, 10
    times = {k: [] for k in cfgs}
    for rep in range(NREP):
        for name in cfgs:
            st, c, img3, img2 = states[name]
            t0 = time.perf_counter()
            for _ in range(NSTEP):
                st, gl = gan.g_step_bands(st, cb, nb, frames, c)
                st, dl, ql = gan.d_step(st, img3, img2, frames, tg, tq, c)
            _ = float(gl) + float(dl)  # real fetch bounds the dispatches
            dt = (time.perf_counter() - t0) / NSTEP
            times[name].append(dt)
            states[name] = (st, c, img3, img2)

    print(f"\nbatch={b} T={t}  platform={jax.devices()[0].platform}")
    med = {}
    for name in cfgs:
        ms = sorted(1000 * x for x in times[name])
        med[name] = ms[len(ms) // 2]
        mfu = flops[name] / (med[name] / 1000) / PEAK_FLOPS
        print(f"{name:9s} ms/step: median={med[name]:.2f} "
              f"min={ms[0]:.2f} max={ms[-1]:.2f}  mfu={mfu:.4f}")
    print(f"speedup bf16 vs f32: {med['float32'] / med['bfloat16']:.3f}x")


if __name__ == "__main__":
    main()
