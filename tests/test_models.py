"""Forward-pass parity: flax models vs the reference torch modules.

The reference model.py imports cleanly (numpy + torch only), so we
instantiate the actual reference networks, convert their state dicts with
models/convert.py, and require matching outputs.
"""
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference")

from nelegan_tpu.models import (Generator, IntelDiscriminator,
                                QualityDiscriminator,
                                torch_generator_to_flax,
                                torch_discriminator_to_flax)


@pytest.fixture(scope="module")
def ref_models():
    try:
        import model as ref_model  # reference /root/reference/model.py
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference model.py unavailable: {e}")
    return ref_model


@pytest.mark.smoke
def test_generator_parity(ref_models):
    torch.manual_seed(0)
    g_ref = ref_models.Generator_Conv1D_cLN().eval()
    params = torch_generator_to_flax(g_ref.state_dict())

    rng = np.random.RandomState(0)
    clean = rng.rand(1, 37, 64).astype(np.float32)
    noise = rng.rand(1, 37, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = g_ref(torch.from_numpy(clean),
                        torch.from_numpy(noise)).numpy()

    ours = np.asarray(Generator().apply({"params": params},
                                        clean, noise))
    assert ours.shape == ref_out.shape == (1, 37, 64)
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)
    # mask bound property
    assert ours.min() >= np.exp(-3.2) - 1e-6
    assert ours.max() <= np.exp(3.2) + 1e-6


def test_generator_causal(ref_models):
    """Changing future inputs must not affect past outputs (Chomp+cLN)."""
    torch.manual_seed(1)
    g_ref = ref_models.Generator_Conv1D_cLN().eval()
    params = torch_generator_to_flax(g_ref.state_dict())
    rng = np.random.RandomState(1)
    clean = rng.rand(1, 50, 64).astype(np.float32)
    noise = rng.rand(1, 50, 64).astype(np.float32)
    out_full = np.asarray(Generator().apply({"params": params}, clean, noise))
    clean2 = clean.copy(); clean2[:, 30:] = 9.9
    out_trunc = np.asarray(Generator().apply({"params": params}, clean2, noise))
    np.testing.assert_allclose(out_full[:, :30], out_trunc[:, :30],
                               rtol=1e-5, atol=1e-6)
    assert np.abs(out_full[:, 30:] - out_trunc[:, 30:]).max() > 1e-3


def _disc_parity(ref_cls, flax_cls, channels, seed):
    # Parity runs in float64: a freshly-initialised spectral norm has random
    # (u, v) and hence a near-zero sigma, which inflates activations to ~1e8
    # and makes the final logits a catastrophic cancellation — f32 rounding
    # noise there is architecture-inherent, not a wiring property.
    import jax
    torch.manual_seed(seed)
    d_ref = ref_cls().double().eval()
    var = torch_discriminator_to_flax(d_ref.state_dict())
    var = jax.tree.map(lambda a: a.astype(np.float64), var)

    rng = np.random.RandomState(seed)
    x = rng.rand(2, channels, 64, 48)  # [B, C, H, W] float64
    with torch.no_grad():
        ref_out = d_ref(torch.from_numpy(x)).numpy()

    x_nhwc = x.transpose(0, 2, 3, 1)
    ours = np.asarray(flax_cls().apply(var, x_nhwc))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-9, atol=1e-12)

    # train-mode parity: one power-iteration update
    d_ref.train()
    ref_out_tr = d_ref(torch.from_numpy(x)).detach().numpy()
    ours_tr, updated = flax_cls().apply(var, x_nhwc, update_sn=True,
                                        mutable=["spectral"])
    np.testing.assert_allclose(np.asarray(ours_tr), ref_out_tr,
                               rtol=1e-9, atol=1e-12)
    # u vectors advanced identically
    u_ref = d_ref.state_dict()["layers.2.weight_u"].numpy()
    u_ours = np.asarray(updated["spectral"]["trunk"]["conv2"]["u"])
    np.testing.assert_allclose(u_ours, u_ref, rtol=1e-9, atol=1e-12)


def test_intel_discriminator_parity(ref_models):
    _disc_parity(ref_models.Discriminator, IntelDiscriminator, 3, 2)


def test_quality_discriminator_parity(ref_models):
    _disc_parity(ref_models.Discriminator_Quality, QualityDiscriminator, 2, 3)


def test_discriminator_masked_pool_matches_unpadded(ref_models):
    """A padded batch with lengths must equal per-sample unpadded runs."""
    import jax
    torch.manual_seed(4)
    d_ref = ref_models.Discriminator().eval()
    var = torch_discriminator_to_flax(d_ref.state_dict())
    var = jax.tree.map(lambda a: a.astype(np.float64), var)
    rng = np.random.RandomState(4)
    t1, t2 = 48, 64
    a = rng.rand(1, 64, t1, 3)
    b = rng.rand(1, 64, t2, 3)
    batch = np.zeros((2, 64, t2, 3))
    batch[0, :, :t1] = a[0]
    batch[1] = b[0]
    lengths = np.array([t1, t2], np.int32)
    out_batch = np.asarray(IntelDiscriminator().apply(var, batch, lengths))
    out_a = np.asarray(IntelDiscriminator().apply(var, a))
    out_b = np.asarray(IntelDiscriminator().apply(var, b))
    np.testing.assert_allclose(out_batch[0], out_a[0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(out_batch[1], out_b[0], rtol=1e-4, atol=1e-6)


def test_export_torch_roundtrip_strict(ref_models, tmp_path):
    """JAX -> torch export: loads into the reference's own modules with
    strict=True and reproduces their forwards exactly (the migration
    loop — train here, deploy through the reference inference stack;
    models/convert.py flax_*_to_torch, reference train_nele.py:272-277)."""
    import jax
    from nelegan_tpu.models.convert import (load_torch_checkpoint,
                                            save_torch_checkpoint)
    torch.manual_seed(7)
    g_ref = ref_models.Generator_Conv1D_cLN().eval()
    d_ref = ref_models.Discriminator().eval()
    q_ref = ref_models.Discriminator_Quality().eval()
    gen = torch_generator_to_flax(g_ref.state_dict())
    intel = torch_discriminator_to_flax(d_ref.state_dict())
    qual = torch_discriminator_to_flax(q_ref.state_dict())

    out = str(tmp_path / "chkpt_GD.pt")
    save_torch_checkpoint(out, generator=gen, intel=intel, quality=qual)

    # strict load into FRESH reference modules + forward equality
    blob = torch.load(out, map_location="cpu", weights_only=True)
    g2 = ref_models.Generator_Conv1D_cLN()
    g2.load_state_dict(blob["enhance-model"], strict=True)
    d2 = ref_models.Discriminator()
    d2.load_state_dict(blob["intel-model"], strict=True)
    q2 = ref_models.Discriminator_Quality()
    q2.load_state_dict(blob["quality-model"], strict=True)
    rng = np.random.RandomState(7)
    clean = rng.rand(1, 23, 64).astype(np.float32)
    noise = rng.rand(1, 23, 64).astype(np.float32)
    x3 = rng.rand(1, 3, 64, 32).astype(np.float32)
    x2 = rng.rand(1, 2, 64, 32).astype(np.float32)
    with torch.no_grad():
        np.testing.assert_array_equal(
            g2.eval()(torch.from_numpy(clean),
                      torch.from_numpy(noise)).numpy(),
            g_ref(torch.from_numpy(clean), torch.from_numpy(noise)).numpy())
        np.testing.assert_array_equal(
            d2.eval()(torch.from_numpy(x3)).numpy(),
            d_ref(torch.from_numpy(x3)).numpy())
        np.testing.assert_array_equal(
            q2.eval()(torch.from_numpy(x2)).numpy(),
            q_ref(torch.from_numpy(x2)).numpy())

    # flax -> torch -> flax round trip is bit-exact
    back = load_torch_checkpoint(out)
    for restored, orig in (
            (back["generator"], gen), (back["intel"], intel),
            (back["quality"], qual)):
        ra, oa = jax.tree.leaves(restored), jax.tree.leaves(orig)
        assert len(ra) == len(oa)
        for a, b in zip(ra, oa):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_torch_cli(ref_models, tmp_path):
    """cli/export_torch end-to-end: our checkpoint dir -> chkpt_GD.pt."""
    import jax
    from nelegan_tpu.cli import export_torch
    from nelegan_tpu.config import Config
    from nelegan_tpu.models.convert import load_torch_checkpoint
    from nelegan_tpu.train import gan
    from nelegan_tpu.train.checkpoint import save_checkpoint

    state = gan.init_train_state(jax.random.PRNGKey(3), Config())
    ckdir = str(tmp_path / "chkpt")
    save_checkpoint(ckdir, 5, state, jax.random.PRNGKey(4))
    out = str(tmp_path / "chkpt_GD.pt")
    export_torch.main(["--checkpoint", ckdir, "--out", out])

    back = load_torch_checkpoint(out)
    assert set(back) == {"generator", "intel", "quality"}
    ra = jax.tree.leaves(back["generator"])
    oa = jax.tree.leaves(jax.tree.map(np.asarray, state.gen_params))
    for a, b in zip(ra, oa):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
