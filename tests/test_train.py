"""End-to-end GAN training smoke test on the toy dataset (fast metrics)."""
import dataclasses
import glob
import os

import numpy as np
import pytest

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
