"""Probe the device attachment: dispatch RTT and transfer bandwidth.

Driver hosts and tunnel service load differ per round (CLAUDE.md), so
recorded perf numbers only compare within a box.  This prints the three
numbers that matter for every transfer-bound phase:

  * tiny round trip (ms)  — the cost of ANY synchronous fetch;
  * upload MB/s           — host->device, bounds featurization input cost;
  * download MB/s         — device->host, bounds wav/result fetch cost.

Usage: python tools/measure_tunnel.py [--mb 8] [--reps 5]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mb", type=int, default=8)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    dev = jax.devices()[0]
    print(f"device: {dev} (platform={dev.platform})")

    # settle / compile the probes first
    np.asarray(jnp.zeros((8,), jnp.float32))
    n = args.mb * (1 << 20) // 4
    buf = np.random.randn(n).astype(np.float32)
    up = jax.jit(lambda a: a.sum())
    float(up(buf))
    gen = jax.jit(lambda k: jax.random.normal(k, (n,)))
    np.asarray(gen(jax.random.PRNGKey(0)))

    rtts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        np.asarray(jnp.zeros((8,), jnp.float32))
        rtts.append(1e3 * (time.perf_counter() - t0))
    print(f"tiny round trip ms: min={min(rtts):.1f} "
          f"median={sorted(rtts)[len(rtts) // 2]:.1f} max={max(rtts):.1f}")

    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(up(buf))  # upload + reduce + scalar fetch
        ts.append(time.perf_counter() - t0)
    print(f"upload {args.mb} MB: min={min(ts):.3f}s "
          f"-> ~{args.mb / min(ts):.1f} MB/s")

    ts = []
    for i in range(args.reps):
        y = gen(jax.random.PRNGKey(i + 1))
        t0 = time.perf_counter()
        np.asarray(y)
        ts.append(time.perf_counter() - t0)
    print(f"download {args.mb} MB: min={min(ts):.3f}s "
          f"-> ~{args.mb / min(ts):.1f} MB/s")

    # --- upload asynchrony: does device_put return before the bytes move?
    # If dispatch is ~ms while completion is ~100 ms, uploads already
    # overlap compute for free (just don't block on them); if dispatch
    # blocks for the full transfer, overlap needs a separate host thread.
    t0 = time.perf_counter()
    h = jax.device_put(buf)
    t_disp = time.perf_counter() - t0
    float(up(h))
    t_done = time.perf_counter() - t0
    print(f"device_put({args.mb} MB): returns after {1e3 * t_disp:.1f} ms, "
          f"data usable after {1e3 * t_done:.1f} ms "
          f"({'ASYNC' if t_disp < t_done / 4 else 'BLOCKING'})")

    # --- concurrent-stream scaling: K threads x (mb) each vs sequential.
    # bw*RTT here is ~750 KB (a TCP-window-sized number): if the limit is
    # per-stream, concurrent device_puts multiply effective bandwidth.
    from concurrent.futures import ThreadPoolExecutor
    bufs = [np.random.randn(n).astype(np.float32) for _ in range(4)]
    t0 = time.perf_counter()
    hs = [jax.device_put(b) for b in bufs]
    for h in hs:
        float(up(h))
    t_seq = time.perf_counter() - t0
    with ThreadPoolExecutor(4) as ex:
        t0 = time.perf_counter()
        hs = list(ex.map(jax.device_put, bufs))
        for h in hs:
            float(up(h))
        t_par = time.perf_counter() - t0
    tot = 4 * args.mb
    print(f"4x{args.mb} MB upload: sequential {t_seq:.3f}s "
          f"({tot / t_seq:.1f} MB/s), 4 threads {t_par:.3f}s "
          f"({tot / t_par:.1f} MB/s) -> {t_seq / t_par:.2f}x")


if __name__ == "__main__":
    main()
