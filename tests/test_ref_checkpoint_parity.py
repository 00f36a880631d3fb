"""Config-1 parity on a REAL torch-trained checkpoint (VERDICT r1 #8).

Round 1 validated models/convert.py only against synthetic state dicts
(the pretrained trained_model/chkpt_GD.pt is a missing blob in the mount).
This closes the loop: train the reference's own torch modules for a few
optimiser steps on the toy corpus (reference G-step math,
train_nele.py:122-155), save the reference checkpoint format
(train_nele.py:272-277), convert it, and assert the enhanced waveform
produced through cli/infer.py matches the reference pipeline's output on
the toy test utterance at PCM16 resolution."""
import os
import sys

import numpy as np
import pytest

TOY = "/root/reference/toy_dataset"
TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")

# trains the reference's torch modules for real optimiser steps — the
# slowest single module on a 1-core host
pytestmark = [pytest.mark.heavy,
              pytest.mark.skipif(not os.path.isdir(TOY),
                                 reason="reference mount unavailable")]


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, TOOLS)
    import ref_shims
    ref_shims.install()
    import model as ref_model  # the reference's networks
    import audio_util  # the reference's DSP
    return ref_model, audio_util


def _toy_pair(split):
    import scipy.io.wavfile as wavfile
    d = os.path.join(TOY, split)
    name = os.listdir(os.path.join(d, "Clean"))[0]
    _, c = wavfile.read(os.path.join(d, "Clean", name))
    _, n = wavfile.read(os.path.join(d, "Noise", name))
    return name, c / 32768.0, n / 32768.0


def _train_reference(ref_model, audio_util, tmp_path):
    """A few real optimiser steps on the reference torch modules."""
    import torch
    torch.manual_seed(666)
    g = ref_model.Generator_Conv1D_cLN()
    d = ref_model.Discriminator()
    dq = ref_model.Discriminator_Quality()
    opt_g = torch.optim.Adam(g.parameters(), lr=5e-4)
    opt_d = torch.optim.Adam(d.parameters(), lr=2.5e-4)

    _, clean, noise = _toy_pair("Train")
    cb, _, _ = audio_util.Sp_and_phase_Speech(clean, power=1 / 6)
    nb, _, _ = audio_util.Sp_and_phase_Noise(noise, power=1 / 6)
    cbt = torch.from_numpy(cb[None]).float()
    nbt = torch.from_numpy(nb[None]).float()

    for _ in range(3):  # G updates (reference train_nele.py:122-155 math)
        opt_g.zero_grad()
        mask = g(cbt, nbt)
        cpw = cbt ** 6
        beta2 = torch.sum(cpw) / torch.sum(mask * cpw)
        enh = cbt * (mask ** (1 / 6)) * (beta2 ** (1 / 6))
        img3 = torch.stack([enh, nbt, cbt], 1).transpose(2, 3)
        img2 = torch.stack([enh, cbt], 1).transpose(2, 3)
        loss = (torch.mean((d(img3) - 1.0) ** 2)
                + 0.5 * torch.mean((dq(img2) - 1.0) ** 2))
        loss.backward()
        opt_g.step()

    for _ in range(2):  # D updates
        opt_d.zero_grad()
        with torch.no_grad():
            mask = g(cbt, nbt)
            beta2 = torch.sum(cbt ** 6) / torch.sum(mask * cbt ** 6)
            enh = cbt * (mask ** (1 / 6)) * (beta2 ** (1 / 6))
            img3 = torch.stack([enh, nbt, cbt], 1).transpose(2, 3)
        target = torch.full((1, 3), 0.7)
        loss_d = torch.mean((d(img3) - target) ** 2)
        loss_d.backward()
        opt_d.step()

    path = str(tmp_path / "chkpt_GD.pt")
    torch.save({"enhance-model": g.state_dict(),
                "intel-model": d.state_dict()}, path)
    # eval mode: torch's spectral norm must stop advancing u/v on forward,
    # or the comparison target drifts from the saved checkpoint
    g.eval()
    d.eval()
    return g, d, path


def _reference_enhance(g, audio_util, clean, noise):
    """The reference inference path (inference.py:90-115)."""
    import torch
    cb, cm, cp = audio_util.Sp_and_phase_Speech(clean, power=1 / 6)
    nb, _, _ = audio_util.Sp_and_phase_Noise(noise, power=1 / 6)
    with torch.no_grad():
        mask = g(torch.from_numpy(cb[None]).float(),
                 torch.from_numpy(nb[None]).float())
        cpw = torch.pow(torch.from_numpy(cb[None]).float(), 6)
        beta2 = torch.sum(cpw) / torch.sum(mask * cpw)
        alpha2 = (mask * beta2).squeeze(0).numpy()
    wav = audio_util.SP_to_wav(alpha2.astype(np.float64), cm, cp)
    return wav / np.sqrt(np.mean(wav ** 2)) * 0.03


def test_trained_checkpoint_roundtrip(ref_modules, tmp_path):
    ref_model, audio_util = ref_modules
    g, d, pt_path = _train_reference(ref_model, audio_util, tmp_path)

    # reference-side enhanced waveform on the toy TEST utterance
    name, clean, noise = _toy_pair("Test")
    ref_wav = _reference_enhance(g, audio_util, clean, noise)

    # our side: the actual CLI, loading the torch checkpoint
    from nelegan_tpu.cli import infer
    out_dir = str(tmp_path / "out")
    infer.main(["--test-clean", os.path.join(TOY, "Test/Clean"),
                "--test-noise", os.path.join(TOY, "Test/Noise"),
                "--torch-checkpoint", pt_path,
                "--output", out_dir, "--num-utts", "1",
                "--batch-size", "1", "--subsets", ""])

    import scipy.io.wavfile as wavfile
    _, ours_i16 = wavfile.read(os.path.join(out_dir, name[:-4] + "@1.wav"))
    ours = ours_i16 / 32768.0

    n = min(len(ref_wav), len(ours))
    # PCM16 resolution + f32-vs-f64 pipeline differences
    diff = np.abs(ref_wav[:n] - ours[:n])
    assert diff.max() < 4.0 / 32768.0, diff.max()
    corr = np.corrcoef(ref_wav[:n], ours[:n])[0, 1]
    assert corr > 0.99999, corr

    # converted D reproduces the trained torch D's scores on real features
    import torch
    from nelegan_tpu.models.convert import load_torch_checkpoint
    from nelegan_tpu.train import gan
    from nelegan_tpu.config import Config
    conv = load_torch_checkpoint(pt_path)
    cb, _, _ = audio_util.Sp_and_phase_Speech(clean, power=1 / 6)
    nb, _, _ = audio_util.Sp_and_phase_Noise(noise, power=1 / 6)
    img3 = np.stack([cb, nb, cb])[None].transpose(0, 1, 3, 2)  # [1,3,64,T]
    with torch.no_grad():
        want = d(torch.from_numpy(img3).float()).numpy()
    disc = gan.IntelDiscriminator.from_config(Config().model)
    got = np.asarray(disc.apply(
        {"params": conv["intel"]["params"],
         "spectral": conv["intel"]["spectral"]},
        np.asarray(img3.transpose(0, 2, 3, 1), np.float32),  # NHWC
        np.asarray([img3.shape[-1]], np.int32)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
