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
