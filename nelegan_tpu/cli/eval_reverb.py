"""Reverb-condition evaluation CLI — the `python eval_metrics.py` equivalent
(reference: eval_metrics.py): evaluate a trained generator under
no-reverb / RIR conditions, scoring raw SIIB/HASPI/ESTOI of
(direct-path clean, reverberant enhanced + noise).

    python -m nelegan_tpu.cli.eval_reverb \
        --test-clean ... --test-noise ... --checkpoint ./chkpt \
        [--rir NO_rev] [--rir path/to/rir.wav ...]
"""
from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--test-clean", required=True)
    p.add_argument("--test-noise", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--torch-checkpoint", default=None)
    p.add_argument("--rir", action="append", default=None,
                   help="'NO_rev' or an RIR wav path; repeatable")
    p.add_argument("--num-utts", type=int, default=720)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--tau", type=int, default=32,
                   help="direct-path taps past the RIR peak")
    p.add_argument("--metrics", default="siib,haspi,estoi")
    p.add_argument("--platform", default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from nelegan_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from nelegan_tpu.config import Config
    from nelegan_tpu import pipeline
    from nelegan_tpu.data.pipeline import (BucketedLoader, CorpusIndex,
                                           get_filepaths)
    from nelegan_tpu.data.wavio import read_wav
    from nelegan_tpu.dsp.reverb import (fir_filter, direct_path_rir,
                                        clip_overflow)
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
        state, _, _, _ = load_checkpoint(args.checkpoint, state)
    else:
        raise SystemExit("need --checkpoint or --torch-checkpoint")

    index = CorpusIndex(sorted(get_filepaths(args.test_clean))[
        : args.num_utts], args.test_noise)
    loader = BucketedLoader(index, batch_size=args.batch_size, shuffle=False)
    metrics = tuple(m.strip() for m in args.metrics.split(",") if m.strip())
    rms = lambda v: np.sqrt(np.mean(v ** 2))

    for rev in (args.rir or ["NO_rev"]):
        rir = None if rev == "NO_rev" else read_wav(rev)[0]
        if rir is not None:
            # RIR-derived quantities are fixed per condition: hoist out of
            # the per-utterance loop
            b = int(np.argmax(rir))
            h_direct = direct_path_rir(rir, args.tau)
        refs, mixes = [], []
        for batch in loader():
            feats = pipeline.featurize_batch(batch.clean, batch.noise,
                                             batch.lengths,
                                             cfg.train.p_power)
            wavs, _, out_lens = pipeline.enhance_batch(
                state.gen_params, feats, cfg.train.p_power,
                cfg.train.target_rms, model_cfg=cfg.model)
            wavs = np.asarray(wavs)
            # one fetch for the batch's lengths (int(out_lens[i]) would
            # cost a tunnel round trip per utterance)
            out_lens = np.asarray(out_lens)
            for i, name in enumerate(batch.names):
                clean, _ = read_wav(os.path.join(args.test_clean, name))
                noise, _ = read_wav(os.path.join(args.test_noise, name))
                enh = wavs[i, :out_lens[i]]
                m = min(len(enh), len(noise), len(clean))
                enh, noise, clean = enh[:m], noise[:m], clean[:m]
                if rir is None:
                    mixed = clip_overflow(enh + noise)
                    clean_a = clean
                else:
                    direct = np.asarray(fir_filter(
                        jnp.asarray(h_direct), jnp.asarray(clean)))
                    direct = clip_overflow(direct / rms(direct) * 0.03)
                    clean_a = direct[b:]
                    rev_enh = np.asarray(fir_filter(
                        jnp.asarray(rir), jnp.asarray(enh)))
                    rev_enh = clip_overflow(rev_enh / rms(rev_enh) * 0.03)
                    mixed = clip_overflow(rev_enh[b:] + noise[b:])
                refs.append(np.asarray(clean_a))
                mixes.append(np.asarray(mixed))
        # one async-dispatch scoring pass per condition (score_pair would
        # cost a device round trip per score through the remote tunnel)
        scores = score_batch(refs, [np.zeros_like(m) for m in mixes], mixes,
                             cfg.train.fs, norm=False, metrics=metrics)
        print(rev)
        if scores:
            print("  " + ", ".join(
                f"{m.upper()} is {np.mean([s[m] for s in scores]):.3f}"
                for m in metrics))
        else:
            print("  no utterances scored for this condition")
        print("=======")


if __name__ == "__main__":
    main()
