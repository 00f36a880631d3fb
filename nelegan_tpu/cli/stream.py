"""Streaming-enhancement CLI — a deployment mode the reference lacks.

Feeds a (clean, noise) wav pair through the frame-streaming enhancer
(`nelegan_tpu.streaming`) in real-time-sized chunks, writes the enhanced
wav, and reports the measured real-time factor and algorithmic latency.

    python -m nelegan_tpu.cli.stream \
        --clean f.wav --noise f.wav --out enhanced.wav \
        --checkpoint ./chkpt [--torch-checkpoint chkpt_GD.pt] \
        [--chunk-ms 128] [--compare-offline]
"""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clean", required=True)
    p.add_argument("--noise", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--torch-checkpoint", default=None)
    p.add_argument("--chunk-ms", type=float, default=128.0,
                   help="feed size in milliseconds (16 ms = one hop)")
    p.add_argument("--compare-offline", action="store_true",
                   help="also run the offline pipeline and report the "
                        "max deviation at matching samples")
    p.add_argument("--platform", default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import time
    import numpy as np
    import jax
    from nelegan_tpu.config import Config
    from nelegan_tpu.data.wavio import read_wav, write_wav_pcm16
    from nelegan_tpu.models.generator import Generator
    from nelegan_tpu.streaming import StreamingEnhancer
    from nelegan_tpu.train import gan
    from nelegan_tpu.train.checkpoint import (config_for_checkpoint,
                                              load_checkpoint,
                                              load_reference_checkpoint)

    cfg = config_for_checkpoint(args.checkpoint)
    state = gan.init_train_state(jax.random.PRNGKey(0), cfg)
    if args.torch_checkpoint:
        state = load_reference_checkpoint(args.torch_checkpoint, state)
    elif args.checkpoint:
        state, _, epoch, _ = load_checkpoint(args.checkpoint, state)
        print(f"loaded checkpoint epoch {epoch}")
    else:
        raise SystemExit("need --checkpoint or --torch-checkpoint")

    from nelegan_tpu.streaming import HOP
    clean, fs = read_wav(args.clean)
    noise, _ = read_wav(args.noise)
    assert fs == cfg.train.fs, (
        f"stream expects {cfg.train.fs} Hz input, got {fs} Hz "
        f"(the generator/IMCRA stack and the 32 ms latency assume 16 kHz)")
    n = min(len(clean), len(noise))
    clean, noise = clean[:n], noise[:n]
    chunk = max(1, int(fs * args.chunk_ms / 1000.0))
    gen = Generator.from_config(cfg.model)
    se = StreamingEnhancer(state.gen_params, gen,
                           chunk_frames=max(1, chunk // HOP))

    # warm the two XLA programs so RTF measures steady-state streaming
    se.process(np.zeros(8192, np.float32), np.zeros(8192, np.float32))
    se.flush()
    se.reset()

    outs = []
    t0 = time.perf_counter()
    for i in range(0, n, chunk):
        outs.append(se.process(clean[i:i + chunk], noise[i:i + chunk]))
    outs.append(se.flush())
    dt = time.perf_counter() - t0
    enh = np.concatenate(outs)
    write_wav_pcm16(args.out, enh, fs)
    print(f"streamed {n / fs:.2f} s of audio in {dt:.2f} s "
          f"(RTF {dt / (n / fs):.3f}); latency "
          f"{StreamingEnhancer.LATENCY_SAMPLES / fs * 1000:.0f} ms; "
          f"wrote {len(enh)} samples -> {args.out}")

    if args.compare_offline:
        import jax.numpy as jnp
        from nelegan_tpu.dsp.features import (featurize_speech,
                                              featurize_noise, resynthesize)
        p = cfg.train.p_power
        cb, mag, phase = featurize_speech(jnp.asarray(clean), p)
        nb, _, _ = featurize_noise(jnp.asarray(noise), p)
        mask = gen.apply({"params": state.gen_params}, cb[None], nb[None])[0]
        cp = cb ** (1.0 / p)
        num = jnp.cumsum(jnp.sum(cp, axis=-1))
        den = jnp.cumsum(jnp.sum(mask * cp, axis=-1))
        # same zero guard as streaming_step: leading digital silence has
        # den == 0 and would NaN the parity report
        den = jnp.maximum(den, 1e-30)
        ref = np.asarray(resynthesize(mask * (num / den)[:, None], mag,
                                      phase))
        m = min(len(ref), len(enh))
        dev = np.abs(ref[:m] - enh[:m]).max()
        print(f"offline-parity max deviation over {m} samples: {dev:.2e}")


if __name__ == "__main__":
    main()
