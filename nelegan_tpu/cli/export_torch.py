"""Export a trained checkpoint to the reference's torch format.

Closes the migration loop (MIGRATION.md): models trained by this
framework deploy back into the reference's torch inference stack
(reference: inference.py loads `{'enhance-model': ..., 'intel-model':
..., 'quality-model': ...}` blobs saved by train_nele.py:272-277).

    python -m nelegan_tpu.cli.export_torch \
        --checkpoint ./chkpt --out chkpt_GD.pt [--generator-only]
"""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="checkpoint dir (uses `latest`) or .msgpack file")
    p.add_argument("--out", required=True, help="output .pt path")
    p.add_argument("--generator-only", action="store_true",
                   help="write only enhance-model (inference needs no Ds)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    # conversion is pure host-side array shuffling; never wake a device
    import jax
    jax.config.update("jax_platforms", "cpu")

    from nelegan_tpu.config import Config, config_from_dict
    from nelegan_tpu.models.convert import save_torch_checkpoint
    from nelegan_tpu.train import gan
    from nelegan_tpu.train.checkpoint import load_checkpoint, peek_meta

    # build the template state from the config the checkpoint was trained
    # with (sidecar extra['config']) — a non-default model shape
    # (gen_blocks, disc channels) would otherwise fail to restore or
    # export the wrong n_blocks; Config() is only the pre-config-sidecar
    # fallback
    try:
        cfg = config_from_dict(peek_meta(args.checkpoint)["extra"]["config"])
    except (KeyError, FileNotFoundError):
        cfg = Config()
    state = gan.init_train_state(jax.random.PRNGKey(0), cfg)
    state, _, epoch, _ = load_checkpoint(args.checkpoint, state)
    kw = {}
    if not args.generator_only:
        kw = {"intel": {"params": state.d_params,
                        "spectral": state.d_spectral},
              "quality": {"params": state.dq_params,
                          "spectral": state.dq_spectral}}
    save_torch_checkpoint(args.out, generator=state.gen_params,
                          n_blocks=cfg.model.gen_blocks, **kw)
    print(f"wrote {args.out} (epoch {epoch}, "
          f"{'G only' if args.generator_only else 'G + both Ds'})")


if __name__ == "__main__":
    main()
