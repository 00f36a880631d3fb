"""Measure the reference implementation's training/scoring baselines.

BASELINE.json names five measurable configs; bench_baseline.json previously
held only config 2 (batch-1 inference utterances/sec).  This script measures
the remaining runnable ones by driving the *reference's own modules*
(/root/reference, via tools/ref_shims — librosa/numba stand-ins, nothing
copied):

  * configs 4+5 — the torch batch-1 G-step (reference train_nele.py:122-156:
    G forward + beta^2 + D/D_Qua forward + backward + Adam on G) and D-step
    (train_nele.py:342-426 body: D fwd/back/Adam + D_Qua fwd/back/Adam) on
    toy_dataset features, CPU, exactly the reference's batch_size=1
    (dataloader.py:90).  Dataloader featurization is excluded on both sides
    (our bench times g_step/d_step on prebuilt features too).
  * config 3 — metric-loss eval: the only reference metric engine runnable
    offline is pyHASPI (pure Python once numba is shimmed to identity —
    numba itself is not installed, and the reference pins no version;
    pysiib/pystoi/pypesq are uninstallable C/pip engines, recorded as such).
    Times haspi_v2 (pyHASPI/pyhaspi2.py:76-107) on the toy pair.

Results merge into bench_baseline.json (existing keys preserved), which
bench.py reads to emit vs_baseline ratios.  Run:
    python tools/measure_baseline.py [--skip-haspi]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, "bench_baseline.json")
TOY_CLEAN = "/root/reference/toy_dataset/Train/Clean/f_hvd_100#Babble#-11.wav"
TOY_NOISE = "/root/reference/toy_dataset/Train/Noise/f_hvd_100#Babble#-11.wav"

sys.path.insert(0, os.path.join(REPO, "tools"))
import ref_shims  # noqa: E402


def _load_toy():
    clean, sr = ref_shims.load_wav(TOY_CLEAN)
    noise, _ = ref_shims.load_wav(TOY_NOISE)
    assert sr == 16000
    return clean.astype(np.float64), noise.astype(np.float64)


def measure_gan_steps(n_iters: int = 20) -> dict:
    """Reference torch batch-1 G-step and D-step rates on CPU.

    Mirrors train_nele.py:122-156 (G step: two 6-block conv nets forward,
    utterance energy norm, both discriminators forward, backward + Adam on G
    only) and train_nele.py:342-426 (D step: D and D_Qua each fwd/back/Adam
    on one [1,C,64,T] image), with hyperparameters from train_nele.py:38-43,
    89-91 (p=1/6, weight_qua=0.5, Adam 5e-4 / 2.5e-4).
    """
    import torch
    import audio_util  # reference
    import model as ref_model  # reference

    torch.manual_seed(666)  # train_nele.py:28
    clean, noise = _load_toy()
    cb, _, _ = audio_util.Sp_and_phase_Speech(clean, power=1 / 6)
    nb, _, _ = audio_util.Sp_and_phase_Noise(noise, power=1 / 6)

    G = ref_model.Generator_Conv1D_cLN()
    D = ref_model.Discriminator()
    DQ = ref_model.Discriminator_Quality()
    mse = torch.nn.MSELoss()
    opt_g = torch.optim.Adam(G.parameters(), lr=5e-4)
    opt_d = torch.optim.Adam(D.parameters(), lr=2.5e-4)
    opt_dq = torch.optim.Adam(DQ.parameters(), lr=2.5e-4)

    clean_band = torch.from_numpy(cb[None]).float()  # [1, T, 64]
    noise_band = torch.from_numpy(nb[None]).float()
    target = torch.ones(1, 3)
    target_qua = torch.ones(1, 2)

    def g_step():  # train_nele.py:122-156
        mask = G(clean_band, noise_band)
        clean_power = torch.pow(clean_band.detach(), 6)
        beta_2 = torch.sum(clean_power) / torch.sum(mask * clean_power)
        beta_p = beta_2 ** (1 / 6)
        enh_band = clean_band * torch.pow(mask, 1 / 6) * beta_p
        ref_band = clean_band.detach()
        enh = enh_band.view(1, 1, *enh_band.shape[1:]).transpose(
            2, 3).contiguous()
        noz = noise_band.view(1, 1, *noise_band.shape[1:]).transpose(
            2, 3).contiguous()
        ref = ref_band.view(1, 1, *ref_band.shape[1:]).transpose(
            2, 3).contiguous()
        d_in = torch.cat((enh, noz, ref), dim=1)
        d_in_q = torch.cat((enh, ref), dim=1)
        loss = mse(D(d_in), target) + 0.5 * mse(DQ(d_in_q), target_qua)
        opt_g.zero_grad()
        loss.backward()
        opt_g.step()

    # D-training image, built like dataloader.py:54-84: three featurized
    # signals stacked channelwise, [1, 3, 64, T] / [1, 2, 64, T]
    eb, _, _ = audio_util.Sp_and_phase_Speech(0.9 * clean, power=1 / 6)
    img = torch.from_numpy(
        np.stack([eb.T, nb.T, cb.T])[None]).float()
    img_q = img[:, (0, 2)]
    t3 = torch.full((1, 3), 0.7)
    t2 = torch.full((1, 2), 0.7)

    def d_step():  # train_nele.py:349-365
        loss = mse(D(img), t3)
        opt_d.zero_grad()
        loss.backward()
        opt_d.step()
        loss_q = mse(DQ(img_q), t2)
        opt_dq.zero_grad()
        loss_q.backward()
        opt_dq.step()

    g_step(), d_step()  # warm allocator/threads
    t0 = time.perf_counter()
    for _ in range(n_iters):
        g_step()
    g_dt = (time.perf_counter() - t0) / n_iters
    t0 = time.perf_counter()
    for _ in range(n_iters):
        d_step()
    d_dt = (time.perf_counter() - t0) / n_iters
    return {
        "gan_g_steps_per_sec": round(1.0 / g_dt, 3),
        "gan_d_steps_per_sec": round(1.0 / d_dt, 3),
        # one full GAN "step" in our bench = one G-step + one D-step at
        # equal utterance counts; reference is batch-1, so utts/sec ==
        # steps/sec on a (G+D) pair
        "gan_steps_per_sec": round(1.0 / (g_dt + d_dt), 3),
        "gan_utts_per_sec": round(1.0 / (g_dt + d_dt), 3),
        "gan_frames": int(cb.shape[0]),
    }


def measure_haspi(n_iters: int = 1) -> dict:
    """Config 3: reference pyHASPI haspi_v2 seconds/score, pure Python.

    numba is not installed in this image (and uninstallable — zero egress),
    so the reference's @jit kernels run as plain Python via the identity
    shim.  That is the honest offline-runnable baseline; recorded as
    engine="pure-python (numba unavailable)".  pysiib / pystoi / pypesq are
    C/pip engines that cannot be installed offline — recorded as
    unavailable rather than faked.
    """
    from pyHASPI.pyhaspi2 import haspi_v2  # reference

    clean, noise = _load_toy()
    deg = clean + 0.3 * noise
    t0 = time.perf_counter()
    for _ in range(n_iters):
        score = haspi_v2(clean, 16000, deg, 16000)
    dt = (time.perf_counter() - t0) / n_iters
    return {
        "haspi_scores_per_sec": round(1.0 / dt, 5),
        "haspi_sec_per_score": round(dt, 2),
        "haspi_engine": "reference pyHASPI pure-python "
                        "(numba unavailable in image)",
        "haspi_sample_score": float(np.asarray(score[0]).ravel()[0]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-haspi", action="store_true")
    ap.add_argument("--haspi-iters", type=int, default=1)
    args = ap.parse_args()

    ref_shims.install(seed=0)

    base = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            base = json.load(f)

    base.update(measure_gan_steps())
    print("gan:", {k: base[k] for k in base if k.startswith("gan_")},
          flush=True)
    if not args.skip_haspi:
        base.update(measure_haspi(args.haspi_iters))
        print("haspi:", base["haspi_sec_per_score"], "s/score", flush=True)
    base["metric_engines_unavailable"] = [
        "pysiib", "pystoi", "pypesq", "visqol-binary"]
    base["train_measured_host"] = {"n_cpus": os.cpu_count(),
                                   "measured": "round 4 driver host"}
    with open(CACHE, "w") as f:
        json.dump(base, f, indent=1)
    print(json.dumps(base, indent=1))


if __name__ == "__main__":
    main()
