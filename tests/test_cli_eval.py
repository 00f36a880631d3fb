"""Smoke tests: infer and eval_reverb CLIs end-to-end on the toy corpus."""
import os

import numpy as np
import pytest

import jax

TOY = "/root/reference/toy_dataset"


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from nelegan_tpu.config import Config
    from nelegan_tpu.train import gan
    from nelegan_tpu.train.checkpoint import save_checkpoint
    state = gan.init_train_state(jax.random.PRNGKey(0), Config())
    path = str(tmp_path_factory.mktemp("ck") / "chkpt")
    save_checkpoint(path, 1, state, jax.random.PRNGKey(1))
    return path


def test_infer_cli(tmp_path, capsys, ckpt):
    from nelegan_tpu.cli import infer
    out = str(tmp_path / "wav")
    infer.main(["--test-clean", os.path.join(TOY, "Test/Clean"),
                "--test-noise", os.path.join(TOY, "Test/Noise"),
                "--checkpoint", ckpt, "--output", out,
                "--num-utts", "1", "--batch-size", "1",
                "--metrics", "estoi,pesq",
                "--subsets", "AirportAnnouncement"])
    printed = capsys.readouterr().out
    assert "enhanced 1 utterances" in printed
    assert "AirportAnnouncement:" in printed
    assert "ESTOI is" in printed and "PESQ is" in printed
    wavs = os.listdir(out)
    assert len(wavs) == 1 and wavs[0].endswith("@1.wav")
    import scipy.io.wavfile as wavfile
    fs, data = wavfile.read(os.path.join(out, wavs[0]))
    assert fs == 16000
    rms = np.sqrt(((data / 32768.0) ** 2).mean())
    assert abs(rms - 0.03) < 2e-3  # exact-RMS renorm (PCM16 quantised)


def test_eval_reverb_cli(tmp_path, capsys, ckpt):
    import scipy.io.wavfile as wavfile
    from nelegan_tpu.cli import eval_reverb
    # synthetic RIR: direct path + a decaying tail
    rir = np.zeros(2000, np.float32)
    rir[40] = 1.0
    rir[200:1200] = 0.2 * np.exp(-np.arange(1000) / 200.0)
    rir_path = str(tmp_path / "rir.wav")
    wavfile.write(rir_path, 16000, (rir * 32767).astype(np.int16))

    eval_reverb.main(["--test-clean", os.path.join(TOY, "Test/Clean"),
                      "--test-noise", os.path.join(TOY, "Test/Noise"),
                      "--checkpoint", ckpt, "--num-utts", "1",
                      "--batch-size", "1", "--metrics", "estoi",
                      "--rir", "NO_rev", "--rir", rir_path])
    printed = capsys.readouterr().out
    assert "NO_rev" in printed and "rir" in printed
    # one raw ESTOI value per condition, both in [-1, 1]
    import re
    vals = [float(v) for v in re.findall(r"ESTOI is ([-\d.]+)", printed)]
    assert len(vals) == 2
    assert all(-1.0 <= v <= 1.0 for v in vals)
