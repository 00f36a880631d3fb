"""Inference CLI — the `python inference.py` equivalent
(reference: inference.py): enhance a test corpus with a trained generator,
write PCM16 wavs at exact RMS 0.03, and report raw metric means per
noise-type subset.

    python -m nelegan_tpu.cli.infer \
        --test-clean .../Test/Clean --test-noise .../Test/Noise \
        --checkpoint ./chkpt [--torch-checkpoint chkpt_GD.pt] \
        --output ./output_wav [--subsets Cafeteria,AirportAnnouncement]
"""
from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--test-clean", required=True)
    p.add_argument("--test-noise", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir or .msgpack file")
    p.add_argument("--torch-checkpoint", default=None,
                   help="reference chkpt_GD.pt")
    p.add_argument("--output", default="./output_wav")
    p.add_argument("--num-utts", type=int, default=960)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--metrics", default="siib,haspi,estoi,pesq,visqol")
    p.add_argument("--subsets", default="Cafeteria,AirportAnnouncement")
    p.add_argument("--platform", default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    if not (args.checkpoint or args.torch_checkpoint):
        raise SystemExit("need --checkpoint or --torch-checkpoint")
    if not os.path.isdir(args.test_clean):
        raise SystemExit(f"--test-clean {args.test_clean} is not a directory")

    from nelegan_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    import jax
    from nelegan_tpu.config import Config
    from nelegan_tpu import pipeline
    from nelegan_tpu.data.pipeline import (BucketedLoader, CorpusIndex,
                                           get_filepaths)
    from nelegan_tpu.data.wavio import read_wav, write_wav_pcm16
    from nelegan_tpu.metrics import score_batch
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

    index = CorpusIndex(sorted(get_filepaths(args.test_clean))[
        : args.num_utts], args.test_noise)
    loader = BucketedLoader(index, batch_size=args.batch_size, shuffle=False)
    os.makedirs(args.output, exist_ok=True)

    import jax.numpy as jnp
    # pass 1: dispatch every batch; keep device handles only, so the chip
    # pipelines the whole corpus without a host round trip per batch
    batches = []
    for batch in loader():
        feats = pipeline.featurize_batch(batch.clean, batch.noise,
                                         batch.lengths, cfg.train.p_power)
        wavs, _, out_lens = pipeline.enhance_batch(
            state.gen_params, feats, cfg.train.p_power, cfg.train.target_rms,
            model_cfg=cfg.model)
        # int16: half the device->host bytes, byte-identical files
        batches.append((batch.names, pipeline.pcm16_quantize_i16(wavs),
                        out_lens))
    written = []
    if batches:
        # pass 2: TWO transfers for the whole corpus (a per-batch fetch
        # costs a ~28 ms tunnel round trip and stalls the dispatch queue;
        # a per-utterance int(out_lens[i]) costs one EACH)
        flat = np.asarray(jnp.concatenate([q.ravel()
                                           for _, q, _ in batches]))
        lens = np.asarray(jnp.concatenate([l for _, _, l in batches]))
        off = loff = 0
        for names, q_dev, _ in batches:
            bs, blen = q_dev.shape
            wavs = flat[off:off + bs * blen].reshape(bs, blen)
            out_lens = lens[loff:loff + bs]
            off += bs * blen
            loff += bs
            for i, name in enumerate(names):
                path = os.path.join(args.output, f"{name[:-4]}@1.wav")
                write_wav_pcm16(path, wavs[i, :out_lens[i]], cfg.train.fs)
                written.append(path)
    print(f"enhanced {len(written)} utterances -> {args.output}")

    metrics = tuple(m.strip() for m in args.metrics.split(",") if m.strip())
    for subset in ([] if not metrics  # --metrics "" = write wavs only
                   else [s for s in args.subsets.split(",") if s]):
        paths = [p for p in written if subset in p]
        if not paths:
            continue
        cleans, noises, enhs = [], [], []
        for p in paths:
            name = os.path.basename(p).split("@")[0] + ".wav"
            cleans.append(read_wav(os.path.join(args.test_clean, name))[0])
            noises.append(read_wav(os.path.join(args.test_noise, name))[0])
            enhs.append(read_wav(p)[0])
        # score_batch dispatches every metric program asynchronously and
        # fetches once — per-pair score_pair costs a device round trip per
        # score through the remote tunnel
        scores = score_batch(cleans, noises, enhs, cfg.train.fs, norm=False,
                             metrics=metrics)
        print(f"{subset}:")
        print("  " + ", ".join(
            f"{m.upper()} is {np.mean([s[m] for s in scores]):.3f}"
            for m in metrics))
        print("======")


if __name__ == "__main__":
    main()
