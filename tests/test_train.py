"""End-to-end GAN training smoke test on the toy dataset (fast metrics)."""
import dataclasses
import glob
import os

import numpy as np
import pytest

# multi-epoch Trainer runs (scan-parity A/B compiles the fused D-scan
# program twice) — many-core suite material; the single-step training
# smoke lives in test_smoke_train.py
pytestmark = pytest.mark.heavy

from nelegan_tpu.config import Config, TrainConfig
from nelegan_tpu.train.loop import Trainer, TrainPaths

TOY = "/root/reference/toy_dataset"


@pytest.fixture()
def toy_trainer(tmp_path):
    cfg = Config(train=TrainConfig(num_sampling=1, num_valid=1,
                                   batch_size=1, gan_epochs=2))
    paths = TrainPaths(
        train_clean=os.path.join(TOY, "Train/Clean"),
        train_noise=os.path.join(TOY, "Train/Noise"),
        test_clean=os.path.join(TOY, "Test/Clean"),
        test_noise=os.path.join(TOY, "Test/Noise"),
        train_enhanced=os.path.join(TOY, "Train/MultiEnh"),
        output=str(tmp_path / "output"),
        checkpoints=str(tmp_path / "chkpt"),
        log_file=str(tmp_path / "log.txt"),
    )
    return Trainer(paths, cfg, metric_set=("estoi", "pesq", "visqol"),
                   valid_metric_set=("estoi",))


def test_two_epochs_and_resume(toy_trainer, tmp_path):
    t = toy_trainer
    g0 = t.state.gen_params["fc1"]["kernel"]
    m1 = t.run_epoch(1)   # epoch 1: no G update, D trains
    assert "estoi" in m1 and 0.0 <= m1["estoi"] <= 1.0
    d_after1 = t.state.d_params

    m2 = t.run_epoch(2)   # epoch 2: G updates too
    g2 = t.state.gen_params["fc1"]["kernel"]
    assert np.abs(np.asarray(g2) - np.asarray(g0)).max() > 0  # G moved
    assert int(t.state.step_d) > int(0)
    assert int(t.state.step_g) >= 1

    # artifacts
    assert os.path.exists(t.paths.log_file)
    lines = open(t.paths.log_file).read().strip().splitlines()
    assert len(lines) == 2 and "EPOCH:2" in lines[1]
    enhanced = glob.glob(os.path.join(
        t.paths.output, "For_discriminator_training", "*@*.wav"))
    assert len(enhanced) == 2  # one per epoch
    assert os.path.exists(os.path.join(t.paths.checkpoints, "latest"))

    # replay grew: epoch adds generated + pre-enhanced corpus entries
    assert len(t.replay.entries) == 4

    # resume restores epoch counter and state
    t2 = Trainer(t.paths, t.cfg, metric_set=("estoi", "pesq", "visqol"),
                 valid_metric_set=("estoi",))
    t2.resume()
    assert t2.start_epoch == 3
    assert int(t2.state.step_g) == int(t.state.step_g)
    assert len(t2.replay.entries) == 4
    np.testing.assert_allclose(
        np.asarray(t2.state.gen_params["fc1"]["kernel"]),
        np.asarray(t.state.gen_params["fc1"]["kernel"]))


def _mini_trainer(tmp_path, tag):
    cfg = Config(train=TrainConfig(num_sampling=1, num_valid=1,
                                   batch_size=1, gan_epochs=2))
    paths = TrainPaths(
        train_clean=os.path.join(TOY, "Train/Clean"),
        train_noise=os.path.join(TOY, "Train/Noise"),
        test_clean=os.path.join(TOY, "Test/Clean"),
        test_noise=os.path.join(TOY, "Test/Noise"),
        train_enhanced=os.path.join(TOY, "Train/MultiEnh"),
        output=str(tmp_path / f"output_{tag}"),
        checkpoints=str(tmp_path / f"chkpt_{tag}"),
        log_file=str(tmp_path / f"log_{tag}.txt"),
    )
    return Trainer(paths, cfg, metric_set=("estoi",),
                   valid_metric_set=("estoi",))


def test_enhance_raw_pool_warm_matches_cold(tmp_path):
    """Warm enhancement gathers pooled raw-signal rows on device instead of
    re-reading + re-uploading the wavs; the written files must be
    byte-identical to the cold (read) pass."""
    t = _mini_trainer(tmp_path, "rawpool")
    assert t._dev_bands is not None
    paths = t.train_index.clean_paths
    w1 = t._write_enhanced(t.train_index, paths, str(tmp_path / "e1"), 1)
    n_pool = len(t._dev_bands)
    assert n_pool > 0          # raw rows were pooled (toy corpus is PCM16)
    w2 = t._write_enhanced(t.train_index, paths, str(tmp_path / "e2"), 1)
    assert len(t._dev_bands) == n_pool   # second pass: pure pool hits
    assert w1 and len(w1) == len(w2)
    for a, b in zip(w1, w2):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read()


def test_device_band_pool_matches_unpooled(tmp_path):
    """The device-resident band pool is a pure data-routing cache: two
    epochs with it must land on the same parameters as two epochs reading
    every wav and re-featurizing on every pass (the mesh-path fallback)."""
    tp = _mini_trainer(tmp_path, "pool")
    assert tp._dev_bands is not None  # single-chip default: pool active
    tp.run_epoch(1)
    tp.run_epoch(2)

    tu = _mini_trainer(tmp_path, "nopool")
    tu._dev_bands = None              # force the unpooled fallback path
    tu.run_epoch(1)
    tu.run_epoch(2)

    jax = pytest.importorskip("jax")
    # atol 2e-6: the pooled path runs the scan-fused D pass, whose XLA
    # fusion order differs from the per-step program by ~1e-7/step in f32
    for a, b in zip(jax.tree_util.tree_leaves(tp.state),
                    jax.tree_util.tree_leaves(tu.state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    assert len(tp._dev_bands) > 0     # the pool actually saw traffic


def test_d_scan_matches_per_step(tmp_path, monkeypatch):
    """The scan-fused D pass (gan.d_steps_scan, default on single-device)
    threads the optimizer state through a lax.scan instead of one jit
    dispatch per group — identical sequential math, so two epochs must
    land on the same parameters as the per-step loop (NELE_D_SCAN=0)."""
    ts = _mini_trainer(tmp_path, "dscan")
    assert ts._dev_bands is not None and ts.mesh is None
    ts.run_epoch(1)
    ts.run_epoch(2)

    monkeypatch.setenv("NELE_D_SCAN", "0")
    tl = _mini_trainer(tmp_path, "dstep")
    tl.run_epoch(1)
    tl.run_epoch(2)

    jax = pytest.importorskip("jax")
    # atol 2e-6: same math, different XLA fusion order (~1e-7/step f32
    # drift, compounded over two epochs)
    for a, b in zip(jax.tree_util.tree_leaves(ts.state),
                    jax.tree_util.tree_leaves(tl.state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
