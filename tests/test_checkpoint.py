"""Checkpoint round trips: ours and reference torch format."""
import sys

import jax
import numpy as np
import torch

sys.path.insert(0, "/root/reference")

from nelegan_tpu.config import Config
from nelegan_tpu.train import gan
from nelegan_tpu.train.checkpoint import (save_checkpoint, load_checkpoint,
                                          load_reference_checkpoint)


def test_save_load_roundtrip(tmp_path):
    cfg = Config()
    state = gan.init_train_state(jax.random.PRNGKey(1), cfg)
    rng = jax.random.PRNGKey(42)
    save_checkpoint(str(tmp_path), 7, state, rng, replay_json='["x"]')
    state2, rng2, epoch, replay = load_checkpoint(str(tmp_path), state)
    assert epoch == 7 and replay == '["x"]'
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(rng)),
                                  np.asarray(jax.random.key_data(rng2)))
    a = jax.tree.leaves(state.gen_params)
    b = jax.tree.leaves(state2.gen_params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_load_reference_torch_checkpoint(tmp_path):
    """Save a checkpoint exactly like the reference (train_nele.py:272-277)
    and load it; outputs must match the torch models."""
    import model as ref_model
    torch.manual_seed(5)
    g = ref_model.Generator_Conv1D_cLN().eval()
    d = ref_model.Discriminator().eval()
    path = str(tmp_path / "chkpt_1.pt")
    torch.save({"enhance-model": g.state_dict(),
                "intel-model": d.state_dict()}, path)

    cfg = Config()
    state = gan.init_train_state(jax.random.PRNGKey(0), cfg)
    state = load_reference_checkpoint(path, state)

    rng = np.random.RandomState(0)
    clean = rng.rand(1, 33, 64).astype(np.float32)
    noise = rng.rand(1, 33, 64).astype(np.float32)
    from nelegan_tpu.models import Generator
    ours = np.asarray(Generator().apply({"params": state.gen_params},
                                        clean, noise))
    with torch.no_grad():
        ref = g(torch.from_numpy(clean), torch.from_numpy(noise)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_config_travels_with_checkpoint(tmp_path):
    """The sidecar persists the training config; config_for_checkpoint
    rebuilds it (incl. non-default model shape) so export/restore never
    assumes Config() defaults (ADVICE r3)."""
    import dataclasses
    from nelegan_tpu.config import config_to_dict, config_from_dict
    from nelegan_tpu.train.checkpoint import config_for_checkpoint

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, gen_blocks=4,
                                       gen_hidden=128),
        train=dataclasses.replace(cfg.train, batch_size=4))
    # dict round trip is exact (tuples come back as tuples)
    assert config_from_dict(config_to_dict(cfg)) == cfg

    state = gan.init_train_state(jax.random.PRNGKey(1), cfg)
    save_checkpoint(str(tmp_path), 3, state, jax.random.PRNGKey(0),
                    extra={"config": config_to_dict(cfg)})
    got = config_for_checkpoint(str(tmp_path))
    assert got == cfg
    # template built from the sidecar config restores the non-default
    # shapes (Config() default would mismatch and fail)
    template = gan.init_train_state(jax.random.PRNGKey(2), got)
    state2, _, _, _ = load_checkpoint(str(tmp_path), template)
    for x, y in zip(jax.tree.leaves(state.gen_params),
                    jax.tree.leaves(state2.gen_params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # pre-sidecar / missing checkpoints fall back to defaults
    assert config_for_checkpoint(None) == Config()


def test_export_torch_uses_checkpoint_config(tmp_path):
    """cli/export_torch exports a non-default-shape checkpoint with the
    right n_blocks instead of rebuilding from Config() (ADVICE r3)."""
    import dataclasses
    from nelegan_tpu.cli import export_torch
    from nelegan_tpu.config import config_to_dict

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, gen_blocks=4,
                                       gen_hidden=64))
    state = gan.init_train_state(jax.random.PRNGKey(1), cfg)
    save_checkpoint(str(tmp_path), 2, state, jax.random.PRNGKey(0),
                    extra={"config": config_to_dict(cfg)})
    out = str(tmp_path / "export.pt")
    export_torch.main(["--checkpoint", str(tmp_path), "--out", out,
                       "--generator-only"])
    sd = torch.load(out, map_location="cpu",
                    weights_only=False)["enhance-model"]
    n_blocks = len({k.split(".")[1] for k in sd
                    if k.startswith("convolutions.")})
    assert n_blocks == 4, sorted(sd)
    got_hidden = sd["convolutions.0.0.conv.weight"].shape[0]
    assert got_hidden == 64, got_hidden


def test_async_saver_and_retention(tmp_path):
    """AsyncSaver overlaps the save with caller work, surfaces background
    failures on wait(), and the retention policy prunes to keep_every/
    keep_last while `latest` stays valid."""
    import os
    from nelegan_tpu.config import ModelConfig
    from nelegan_tpu.train.checkpoint import (AsyncSaver, load_checkpoint,
                                              prune_checkpoints)
    import dataclasses
    cfg = dataclasses.replace(
        Config(), model=ModelConfig(gen_hidden=32, gen_blocks=2,
                                    disc_channels=(4, 8),
                                    disc_kernels=(1, 3)))
    state = gan.init_train_state(jax.random.PRNGKey(0), cfg)
    saver = AsyncSaver()
    for ep in range(1, 8):
        saver.save_async(str(tmp_path), ep, state, jax.random.PRNGKey(ep),
                         keep_every=5, keep_last=2)
    saver.wait()
    kept = sorted(int(n.split("_")[1].split(".")[0])
                  for n in os.listdir(tmp_path)
                  if n.endswith(".msgpack"))
    # keep_every=5 keeps epoch 5; keep_last=2 keeps epochs 6, 7
    assert kept == [5, 6, 7], kept
    st2, _, epoch, _ = load_checkpoint(str(tmp_path), state)
    assert epoch == 7
    for x, y in zip(jax.tree.leaves(state.gen_params),
                    jax.tree.leaves(st2.gen_params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # keep-all default: nothing pruned
    assert prune_checkpoints(str(tmp_path), 7, 0, 2) == 0

    # a failing background save surfaces on the next wait()
    bad = str(tmp_path / ("x" * 300))  # exceeds NAME_MAX -> mkdir fails
    saver.save_async(bad, 1, state, jax.random.PRNGKey(0))
    import pytest as _pytest
    with _pytest.raises(OSError):
        saver.wait()
