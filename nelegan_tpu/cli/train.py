"""Training CLI — the `python train_nele.py` equivalent with a real flag
system instead of edit-the-source configuration (reference:
train_nele.py:30-68, README.md:43).

    python -m nelegan_tpu.cli.train \
        --train-clean .../Train/Clean --train-noise .../Train/Noise \
        --test-clean .../Test/Clean --test-noise .../Test/Noise \
        [--train-enhanced .../Train/MultiEnh] [--epochs 500] [--resume]
"""
from __future__ import annotations

import argparse
import dataclasses


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train-clean", required=True)
    p.add_argument("--train-noise", required=True)
    p.add_argument("--test-clean", required=True)
    p.add_argument("--test-noise", required=True)
    p.add_argument("--train-enhanced", default=None,
                   help="pre-enhanced (e.g. SSDRC) parallel corpus for D")
    p.add_argument("--output", default="./output")
    p.add_argument("--checkpoints", default="./chkpt")
    p.add_argument("--log-file", default="./log.txt")
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--num-sampling", type=int, default=300)
    p.add_argument("--num-valid", type=int, default=480)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seed", type=int, default=666)
    p.add_argument("--lr-g", type=float, default=5e-4)
    p.add_argument("--lr-d", type=float, default=2.5e-4)
    p.add_argument("--weight-qua", type=float, default=0.5)
    p.add_argument("--metrics", default="siib,haspi,estoi,pesq,visqol")
    p.add_argument("--compute-dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="model trunk activation dtype (bf16 mixed "
                        "precision; params/checkpoints stay f32)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard batches over all devices ('data' mesh axis)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint")
    p.add_argument("--max-retries", type=int, default=0,
                   help="elastic recovery: on transient failures, rebuild "
                        "the trainer, resume from the latest checkpoint, "
                        "and continue (up to N extra attempts)")
    p.add_argument("--init-from-torch", default=None,
                   help="reference chkpt_GD.pt to initialise from")
    p.add_argument("--platform", default=None,
                   help="force jax platform (cpu/tpu)")
    p.add_argument("--verbose-timing", action="store_true",
                   help="print per-epoch phase timing deltas")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from nelegan_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from nelegan_tpu.config import Config, ModelConfig, TrainConfig
    from nelegan_tpu.train.loop import Trainer, TrainPaths

    cfg = Config(train=TrainConfig(
        gan_epochs=args.epochs, num_sampling=args.num_sampling,
        num_valid=args.num_valid, batch_size=args.batch_size,
        seed=args.seed, lr_g=args.lr_g, lr_d=args.lr_d,
        lr_dqua=args.lr_d, weight_qua=args.weight_qua),
        model=ModelConfig(compute_dtype=args.compute_dtype))
    paths = TrainPaths(
        train_clean=args.train_clean, train_noise=args.train_noise,
        test_clean=args.test_clean, test_noise=args.test_noise,
        train_enhanced=args.train_enhanced, output=args.output,
        checkpoints=args.checkpoints, log_file=args.log_file)

    metrics = tuple(m.strip() for m in args.metrics.split(",") if m.strip())

    def make_trainer():
        trainer = Trainer(paths, cfg, metric_set=metrics,
                          data_parallel=args.data_parallel)
        if args.init_from_torch:
            from nelegan_tpu.train.checkpoint import (
                load_reference_checkpoint)
            trainer.state = load_reference_checkpoint(args.init_from_torch,
                                                      trainer.state)
            print(f"initialised from {args.init_from_torch}")
        if args.resume:
            trainer.resume(truncate_log=True)
            print(f"resumed at epoch {trainer.start_epoch}")
        return trainer

    if args.max_retries > 0:
        from nelegan_tpu.train.resilience import run_with_recovery
        run_with_recovery(make_trainer, args.epochs,
                          max_retries=args.max_retries,
                          verbose_timing=args.verbose_timing)
    else:
        make_trainer().run(args.epochs, verbose_timing=args.verbose_timing)


if __name__ == "__main__":
    main()
