"""Elastic recovery: a mid-run failure resumes from the latest checkpoint
and completes, with no epoch lost and none double-counted in the log."""
import os

import pytest

from nelegan_tpu.config import Config, TrainConfig
from nelegan_tpu.train.loop import Trainer, TrainPaths
from nelegan_tpu.train.resilience import run_with_recovery

TOY = "/root/reference/toy_dataset"


def test_run_with_recovery(tmp_path):
    cfg = Config(train=TrainConfig(num_sampling=1, num_valid=1,
                                   batch_size=1, gan_epochs=3))
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
    attempts = {"n": 0}

    class Flaky(Trainer):
        def run_epoch(self, epoch):
            if attempts["n"] == 1 and epoch == 2:
                raise RuntimeError("injected tunnel fault")
            return super().run_epoch(epoch)

    def make():
        attempts["n"] += 1
        return Flaky(paths, cfg, metric_set=("estoi",),
                     valid_metric_set=("estoi",))

    t = run_with_recovery(make, epochs=3, max_retries=2,
                          backoff_seconds=0.01)
    assert attempts["n"] == 2                      # exactly one rebuild
    lines = open(paths.log_file).read().strip().splitlines()
    assert len(lines) == 3                         # epochs 1..3, once each
    assert "EPOCH:3" in lines[-1]
    assert int(t.state.step_g) >= 1


def test_recovery_exhausts_and_raises(tmp_path):
    def make():
        raise RuntimeError("always fails")
    with pytest.raises(RuntimeError, match="always fails"):
        run_with_recovery(make, epochs=1, max_retries=1,
                          backoff_seconds=0.01)
