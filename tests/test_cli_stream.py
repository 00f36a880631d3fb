"""Smoke tests: streaming CLI end-to-end + synthetic corpus generator."""
import os
import sys

import numpy as np
import pytest


TOY_CLEAN = ("/root/reference/toy_dataset/Train/Clean/"
             "f_hvd_100#Babble#-11.wav")
TOY_NOISE = ("/root/reference/toy_dataset/Train/Noise/"
             "f_hvd_100#Babble#-11.wav")


def test_stream_cli_roundtrip(tmp_path, capsys):
    import jax
    from nelegan_tpu.config import Config
    from nelegan_tpu.train import gan
    from nelegan_tpu.train.checkpoint import save_checkpoint
    from nelegan_tpu.cli import stream

    state = gan.init_train_state(jax.random.PRNGKey(0), Config())
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, 1, state, jax.random.PRNGKey(1))
    out = str(tmp_path / "enh.wav")
    stream.main(["--clean", TOY_CLEAN, "--noise", TOY_NOISE, "--out", out,
                 "--checkpoint", ckpt, "--compare-offline"])
    printed = capsys.readouterr().out
    assert "RTF" in printed and os.path.exists(out)
    dev = float(printed.rsplit(":", 1)[-1])
    assert dev < 1e-5  # offline parity (f32)


def test_make_synth_corpus(tmp_path):
    sys.path.insert(0, "/root/repo/tools")
    try:
        import make_synth_corpus as msc
    finally:
        sys.path.pop(0)
    rng = np.random.default_rng(0)
    speech = msc.synth_speech(rng, 2.0)
    assert abs(np.sqrt((speech ** 2).mean()) - 0.03) < 1e-6
    for kind in msc.NOISE_TYPES:
        nz = msc.synth_noise(rng, kind, len(speech))
        assert nz.shape == speech.shape
        assert abs(np.sqrt((nz ** 2).mean()) - 0.03) < 1e-6
    enh = msc.ssdrc_like(speech)
    assert abs(np.sqrt((enh ** 2).mean()) - 0.03) < 1e-6

    # end-to-end layout
    out = str(tmp_path / "corpus")
    sys.argv, argv0 = ["x", out, "--n-train", "2", "--n-test", "1"], sys.argv
    try:
        msc.main()
    finally:
        sys.argv = argv0
    names = os.listdir(os.path.join(out, "Train", "Clean"))
    assert len(names) == 2
    assert set(os.listdir(os.path.join(out, "Train", "MultiEnh"))) == set(
        names)
    assert set(os.listdir(os.path.join(out, "Train", "Noise"))) == set(names)
    # the stored noise embodies the SNR named in the file
    import scipy.io.wavfile as wavfile
    for nm in names:
        snr = int(nm.split("#")[-1].split(".")[0])
        _, c = wavfile.read(os.path.join(out, "Train", "Clean", nm))
        _, nz = wavfile.read(os.path.join(out, "Train", "Noise", nm))
        snr_actual = 20 * np.log10(
            np.sqrt(((c / 32768.0) ** 2).mean())
            / np.sqrt(((nz / 32768.0) ** 2).mean()))
        assert abs(snr_actual - snr) < 0.5, (nm, snr_actual)
