"""Benchmark: batched enhancement throughput vs the reference CPU pipeline.

Headline metric: enhanced utterances/sec end-to-end on ~2.1 s 16 kHz
utterances — STFT + IMCRA noise tracking + generator + beta^2 + band-gain
resynthesis + RMS normalisation (BASELINE.json config 2), batch-16 jitted on
the default JAX platform (the driver runs this on one TPU chip).

Baseline: the reference implementation's own code path (torch generator via
/root/reference/model.py plus reference audio_util featurization/resynthesis
run in-process through tools/ref_shims — librosa is unavailable here, so its
STFT is supplied by torch with identical semantics), batch-of-1 on CPU
exactly as the reference runs it (train_nele.py:38, dataloader.py:90).  The
measured value is cached in bench_baseline.json so reruns don't depend on
the reference mount.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "bench_baseline.json")
TOY_CLEAN = "/root/reference/toy_dataset/Train/Clean/f_hvd_100#Babble#-11.wav"
TOY_NOISE = "/root/reference/toy_dataset/Train/Noise/f_hvd_100#Babble#-11.wav"
BATCH = 16
STEPS = 20


def _load_toy():
    from nelegan_tpu.data.wavio import read_wav
    clean, sr = read_wav(TOY_CLEAN)
    noise, _ = read_wav(TOY_NOISE)
    assert sr == 16000
    return clean, noise


def measure_ours() -> dict:
    import jax
    from nelegan_tpu.config import Config
    from nelegan_tpu.models.generator import Generator
    from nelegan_tpu import pipeline

    cfg = Config()
    clean, noise = _load_toy()
    clean_p, lengths = pipeline.reflect_pad_batch([clean] * BATCH)
    noise_p, _ = pipeline.reflect_pad_batch([noise] * BATCH)
    params = Generator().init(
        jax.random.PRNGKey(0), np.zeros((1, 8, 64), np.float32),
        np.zeros((1, 8, 64), np.float32))["params"]

    @jax.jit
    def step(params, clean_p, noise_p, lengths):
        feats = pipeline.featurize_batch(clean_p, noise_p, lengths,
                                         cfg.train.p_power)
        wav, _, _ = pipeline.enhance_batch(params, feats, cfg.train.p_power,
                                           cfg.train.target_rms)
        return wav

    out = step(params, clean_p, noise_p, lengths)
    out.block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = step(params, clean_p, noise_p, lengths)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    utts_per_sec = BATCH * STEPS / dt
    return {"utts_per_sec": utts_per_sec,
            "ms_per_batch": 1000.0 * dt / STEPS,
            "platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0])}


def measure_reference_baseline(n_iters: int = 3) -> float:
    """Reference pipeline, batch-of-1 CPU, utterances/sec."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import ref_shims
    ref_shims.install()
    import torch
    import audio_util  # reference
    import model as ref_model  # reference

    clean, noise = _load_toy()
    clean = clean.astype(np.float64)
    noise = noise.astype(np.float64)
    torch.manual_seed(0)
    g = ref_model.Generator_Conv1D_cLN().eval()

    def one():
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

    one()  # warm numba-free path
    t0 = time.perf_counter()
    for _ in range(n_iters):
        one()
    dt = time.perf_counter() - t0
    return n_iters / dt


def get_baseline() -> dict:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)
    base = {"utts_per_sec": measure_reference_baseline(),
            "config": "reference torch+numpy batch-1 CPU pipeline "
                      "(inference.py:80-109 equivalent)"}
    with open(BASELINE_CACHE, "w") as f:
        json.dump(base, f, indent=1)
    return base


def main():
    try:
        base = get_baseline()
    except Exception as e:  # reference mount unavailable
        base = {"utts_per_sec": None, "error": str(e)}
    ours = measure_ours()
    vs = (ours["utts_per_sec"] / base["utts_per_sec"]
          if base.get("utts_per_sec") else None)
    print(json.dumps({
        "metric": "enhanced_utterances_per_sec",
        "value": round(ours["utts_per_sec"], 2),
        "unit": "utt/s (2.1 s, 16 kHz, incl. IMCRA featurization)",
        "vs_baseline": round(vs, 2) if vs else None,
        "baseline_utts_per_sec": base.get("utts_per_sec"),
        "batch": BATCH,
        "ms_per_batch": round(ours["ms_per_batch"], 2),
        "platform": ours["platform"],
    }))


if __name__ == "__main__":
    main()
