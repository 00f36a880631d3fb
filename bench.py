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
# v5e peak: 197 TFLOP/s bf16 (MXU).  The pipeline runs f32 (which the MXU
# executes below bf16 peak), so MFU numbers here are conservative fractions
# of the bf16 peak — the standard accounting.
PEAK_FLOPS = 197e12


def _program_flops(jitted, *args, **kwargs) -> float:
    """Compiler-estimated FLOPs of one call of a jitted program."""
    try:
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _mfu(flops_per_call: float, sec_per_call: float) -> float:
    if not flops_per_call or sec_per_call <= 0:
        return 0.0
    return round(flops_per_call / sec_per_call / PEAK_FLOPS, 5)


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
    # ship raw PCM16 and convert on device: identical output (toy wavs are
    # PCM16, so f32 = int16/32768 exactly; featurize_batch converts with
    # the same formula) at half the transfer bytes — end-to-end throughput
    # through the device tunnel is transfer-bound, not compute-bound
    # (measured: f32 91-105 ms/16-batch vs pcm16 49-63, device-resident 9)
    clean16 = (clean * 32768.0).astype(np.int16)
    noise16 = (noise * 32768.0).astype(np.int16)
    clean_p, lengths = pipeline.reflect_pad_batch([clean16] * BATCH)
    noise_p, _ = pipeline.reflect_pad_batch([noise16] * BATCH)
    params = Generator().init(
        jax.random.PRNGKey(0), np.zeros((1, 8, 64), np.float32),
        np.zeros((1, 8, 64), np.float32))["params"]
    params = jax.device_put(params)

    @jax.jit
    def step(params, clean_p, noise_p, lengths):
        feats = pipeline.featurize_batch(clean_p, noise_p, lengths,
                                         cfg.train.p_power)
        wav, _, _ = pipeline.enhance_batch(params, feats, cfg.train.p_power,
                                           cfg.train.target_rms)
        return wav

    out = step(params, clean_p, noise_p, lengths)
    np.asarray(out)  # compile + settle (block_until_ready does not
    # synchronise through the remote-device tunnel; only a real fetch does)
    # median of 3 timed reps: tunnel service load varies ~10x across
    # rounds and first-call-after-idle spikes 10-60x (round-2 VERDICT
    # item 2 — single-rep headline numbers were not host-robust)
    rep_dt = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = step(params, clean_p, noise_p, lengths)
        np.asarray(out)  # device executes dispatches in order, so fetching
        # the last output bounds all STEPS batches; one fetch per rep
        rep_dt.append(time.perf_counter() - t0)
    dt = sorted(rep_dt)[1]
    utts_per_sec = BATCH * STEPS / dt
    flops = _program_flops(step, params, clean_p, noise_p, lengths)
    res = {"utts_per_sec": utts_per_sec,
           "ms_per_batch": 1000.0 * dt / STEPS,
           "flops_per_batch": flops,
           "mfu_enhance": _mfu(flops, dt / STEPS),
           "platform": jax.devices()[0].platform,
           "device": str(jax.devices()[0])}

    # compute ceiling: same program with device-resident inputs at a wide
    # batch — what a locally-attached chip (PCIe/HBM feeds, no tunnel)
    # would sustain; the delta vs the headline is pure transfer cost
    bw = 128
    cw, lw = pipeline.reflect_pad_batch([clean16] * bw)
    nw, _ = pipeline.reflect_pad_batch([noise16] * bw)
    dc, dn, dl = jax.device_put((cw, nw, lw))
    out = step(params, dc, dn, dl)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = step(params, dc, dn, dl)
    np.asarray(out)
    dtw = time.perf_counter() - t0
    res["device_resident_utts_per_sec"] = round(bw * STEPS / dtw, 2)
    res["device_resident_batch"] = bw
    fw = _program_flops(step, params, dc, dn, dl)
    res["mfu_enhance_device_resident"] = _mfu(fw, dtw / STEPS)

    # apples-to-apples transfer decomposition (round-4 VERDICT weak #6):
    # the SAME batch width as the headline, device-resident — headline /
    # this ratio is pure tunnel cost at matched program shape
    dc16, dn16, dl16 = jax.device_put((clean_p, noise_p, lengths))
    out = step(params, dc16, dn16, dl16)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = step(params, dc16, dn16, dl16)
    np.asarray(out)
    dt16 = time.perf_counter() - t0
    res["device_resident_utts_per_sec_headline_batch"] = round(
        BATCH * STEPS / dt16, 2)
    return res


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


def measure_env() -> dict:
    """Tunnel/host telemetry emitted with every BENCH line so round-over-
    round headline swings decompose into environment vs code at a glance
    (driver hosts differ per round: round 3's box had 1 CPU core, round 2's
    many; tunnel service load varies ~10x — CLAUDE.md).  Same probes as
    tools/measure_tunnel.py, trimmed to ~1 s of wall clock."""
    import jax
    import jax.numpy as jnp
    out = {"n_host_cpus": os.cpu_count()}
    try:
        np.asarray(jnp.zeros((8,), jnp.float32))  # compile/settle
        rtts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(jnp.zeros((8,), jnp.float32))
            rtts.append(1e3 * (time.perf_counter() - t0))
        out["tunnel_rtt_ms"] = round(sorted(rtts)[len(rtts) // 2], 1)
        mb = 4
        buf = np.random.randn(mb << 18).astype(np.float32)  # mb MB
        up = jax.jit(lambda a: a.sum())
        float(up(buf))  # compile + settle
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(up(buf))  # upload + reduce + scalar fetch
            ts.append(time.perf_counter() - t0)
        out["tunnel_mbps"] = round(mb / min(ts), 1)
    except Exception as e:
        out["env_probe_error"] = str(e)[:80]
    return out


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


def measure_extras() -> dict:
    """Secondary BASELINE.json configs: single-utterance inference, GAN
    steps/sec (G+D), metric scoring/sec."""
    import jax
    import jax.numpy as jnp
    from nelegan_tpu.config import Config
    from nelegan_tpu import pipeline
    from nelegan_tpu.train import gan
    from nelegan_tpu.metrics.haspi import haspi_v2_24k
    from nelegan_tpu.metrics.estoi import estoi_10k
    from nelegan_tpu.dsp.resample import resample_poly
    from nelegan_tpu.models.generator import Generator

    cfg = Config()
    clean, noise = _load_toy()
    out = {}

    # config 1: single-utterance inference (batch 1)
    params = Generator().init(
        jax.random.PRNGKey(0), np.zeros((1, 8, 64), np.float32),
        np.zeros((1, 8, 64), np.float32))["params"]
    _ = np.asarray(pipeline.enhance_utterance(params, clean, noise))
    t0 = time.perf_counter()
    for _ in range(10):
        w = np.asarray(pipeline.enhance_utterance(params, clean, noise))
    out["single_utt_per_sec"] = round(10 / (time.perf_counter() - t0), 2)

    # config 4+5: jitted G-step + D-step over a batch-8 bucket
    b = 8
    clean_p, lengths = pipeline.reflect_pad_batch([clean] * b)
    noise_p, _ = pipeline.reflect_pad_batch([noise] * b)
    state = gan.init_train_state(jax.random.PRNGKey(0), cfg)
    feats = pipeline.featurize_batch(clean_p, noise_p, lengths,
                                     cfg.train.p_power)
    state, gl = gan.g_step(state, feats, cfg)
    img3, img2, frames = gan.featurize_triple(clean_p, noise_p, clean_p,
                                              lengths, cfg)
    tg = np.full((b, 3), 0.7, np.float32)
    tq = np.full((b, 2), 0.7, np.float32)
    state, dl, ql = gan.d_step(state, img3, img2, frames, tg, tq, cfg)
    float(gl); float(dl)
    t0 = time.perf_counter()
    for _ in range(10):
        state, gl = gan.g_step(state, feats, cfg)
        state, dl, ql = gan.d_step(state, img3, img2, frames, tg, tq, cfg)
    _ = float(gl) + float(dl)
    dt = (time.perf_counter() - t0) / 10
    out["gan_steps_per_sec"] = round(1.0 / dt, 2)
    out["gan_utts_per_sec"] = round(b / dt, 2)
    fg = _program_flops(gan.g_step_bands, state, feats.clean_band,
                        feats.noise_band, feats.frames, cfg=cfg)
    fd = _program_flops(gan.d_step, state, img3, img2, frames, tg, tq,
                        cfg=cfg)
    out["mfu_gan_step"] = _mfu(fg + fd, dt)
    out["flops_g_step"] = fg
    out["flops_d_step"] = fd

    # config 4+5 addendum: GAN step at production width (batch 64) under
    # the bf16 mixed-precision policy (config.ModelConfig.compute_dtype).
    # At batch 8 the step is dispatch/latency-bound and bf16 is a wash
    # (measured 1.02x); at batch 64 activations dominate and bf16 buys
    # 1.15x over f32's 0.216 MFU (tools/measure_bf16.py regenerates the
    # A/B).  ~2.4e12 flops/step.
    import dataclasses
    b64 = 64
    cfg16 = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"))
    cb = jnp.tile(feats.clean_band, (b64 // b, 1, 1))
    nb = jnp.tile(feats.noise_band, (b64 // b, 1, 1))
    fr = jnp.tile(feats.frames, (b64 // b,))
    tg64 = np.full((b64, 3), 0.7, np.float32)
    tq64 = np.full((b64, 2), 0.7, np.float32)
    st16 = gan.init_train_state(jax.random.PRNGKey(0), cfg16)
    img3b, img2b = gan.d_images(cb, nb, cb, fr)
    st16, gl = gan.g_step_bands(st16, cb, nb, fr, cfg16)
    st16, dl, ql = gan.d_step(st16, img3b, img2b, fr, tg64, tq64, cfg16)
    float(gl)
    t0 = time.perf_counter()
    for _ in range(10):
        st16, gl = gan.g_step_bands(st16, cb, nb, fr, cfg16)
        st16, dl, ql = gan.d_step(st16, img3b, img2b, fr, tg64, tq64, cfg16)
    _ = float(gl) + float(dl)
    dt64 = (time.perf_counter() - t0) / 10
    fg16 = _program_flops(gan.g_step_bands, st16, cb, nb, fr, cfg=cfg16)
    fd16 = _program_flops(gan.d_step, st16, img3b, img2b, fr, tg64, tq64,
                          cfg=cfg16)
    out["gan_utts_per_sec_b64_bf16"] = round(b64 / dt64, 2)
    out["mfu_gan_step_b64_bf16"] = _mfu(fg16 + fd16, dt64)

    # config 3: metric-loss forwards (HASPI v2 + ESTOI on-device)
    x24 = resample_poly(jnp.asarray(clean), 3, 2)
    y24 = resample_poly(jnp.asarray(clean + noise), 3, 2)
    hs = jax.jit(lambda a, c: haspi_v2_24k(a, c)[0])
    _ = float(hs(x24, y24))
    t0 = time.perf_counter()
    for _ in range(5):
        s = hs(x24, y24)
    _ = float(s)  # one fetch bounds the 5 in-order dispatches
    dt_h = (time.perf_counter() - t0) / 5
    out["haspi_scores_per_sec"] = round(1.0 / dt_h, 2)
    fh = _program_flops(hs, x24, y24)
    out["mfu_haspi"] = _mfu(fh, dt_h)
    out["flops_haspi"] = fh
    # degraded-side throughput with the clean half cached (the training
    # loop's steady-state path: clean references repeat across epochs)
    from nelegan_tpu.metrics.haspi import (haspi_v2_clean_24k,
                                           haspi_v2_from_clean_24k)
    nv = jnp.full((8,), x24.shape[-1], jnp.int32)
    X8 = jnp.asarray(np.tile(np.asarray(x24), (8, 1)))
    Y8 = jnp.asarray(np.tile(np.asarray(y24), (8, 1)))
    cl8 = jax.jit(jax.vmap(
        lambda a, v: haspi_v2_clean_24k(a, n_valid=v)))(X8, nv)
    cl8 = jax.tree.map(jnp.asarray, cl8)
    hd = jax.jit(jax.vmap(
        lambda b, v, c: haspi_v2_from_clean_24k(b, c, n_valid=v)[0]))
    _ = np.asarray(hd(Y8, nv, cl8))
    t0 = time.perf_counter()
    for _ in range(5):
        s = hd(Y8, nv, cl8)
    _ = np.asarray(s)
    out["haspi_degraded_scores_per_sec_warm"] = round(
        40 / (time.perf_counter() - t0), 2)

    # batched protocol like HASPI/PESQ above (8-wide vmap, one fetch per
    # rep of 5 in-order dispatches): the old single-signal float() loop
    # measured one ~28 ms tunnel round trip per score — ESTOI's device
    # time is ~ms (tools/prof_estoi.py), so that number was pure RTT
    x10 = resample_poly(jnp.asarray(clean), 5, 8)
    y10 = resample_poly(jnp.asarray(clean + noise), 5, 8)
    X10 = jnp.asarray(np.tile(np.asarray(x10), (8, 1)))
    Y10 = jnp.asarray(np.tile(np.asarray(y10), (8, 1)))
    es = jax.jit(jax.vmap(estoi_10k))
    _ = np.asarray(es(X10, Y10))
    t0 = time.perf_counter()
    for _ in range(5):
        s = es(X10, Y10)
    _ = np.asarray(s)
    out["estoi_scores_per_sec"] = round(40 / (time.perf_counter() - t0), 2)

    # config 3 addendum: full ITU-T P.862 PESQ, 8-wide batched
    from nelegan_tpu.metrics.pesq import pesq_p862_16k
    refs = jnp.asarray(np.stack([clean] * 8))
    degs = jnp.asarray(np.stack([clean + 0.3 * noise] * 8))
    nv = jnp.full((8,), len(clean), jnp.int32)
    pq = jax.jit(jax.vmap(pesq_p862_16k))
    _ = np.asarray(pq(refs, degs, nv))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(pq(refs, degs, nv))
    out["pesq_scores_per_sec"] = round(40 / (time.perf_counter() - t0), 2)

    # config 2 addendum: P.56 active-speech-level normalization, batched
    wavs = jnp.asarray(np.stack([clean] * BATCH))
    _ = np.asarray(pipeline.active_speech_level_batch(wavs))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = np.asarray(pipeline.active_speech_level_batch(wavs))
    out["aslp56_utts_per_sec"] = round(
        10 * BATCH / (time.perf_counter() - t0), 2)

    # config 3 addendum (LAST: it compiles several metric programs, and
    # remote-compile latency varies ~10x with service load — if it stalls,
    # everything above is already measured): bucketed corpus scoring with
    # the clean-side pool (training-loop path — clean references repeat).
    # Robust protocol (round-2 VERDICT item 2): TWO fill reps (first-call-
    # after-idle spikes 10-60x on this tunnel), then >= 3 timed warm reps,
    # report the MEDIAN plus spread — a single-rep number is hostage to
    # tunnel service load that varies ~10x across rounds.
    try:
        from nelegan_tpu.metrics import score_corpus
        from nelegan_tpu.metrics.clean_pool import CleanSidePool
        cs = [clean * (0.9 + 0.01 * i) for i in range(8)]
        ns = [noise * 0.3] * 8
        es = [c * 0.9 for c in cs]
        ks = [f"u{i}" for i in range(8)]
        pool = CleanSidePool()
        sm = ("siib", "haspi", "estoi")
        for _ in range(2):  # compile + fill + settle
            score_corpus(cs, ns, es, norm=False, metrics=sm,
                         clean_cache=pool, clean_keys=ks)
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            score_corpus(cs, ns, es, norm=False, metrics=sm,
                         clean_cache=pool, clean_keys=ks)
            reps.append(8 / (time.perf_counter() - t0))
        reps.sort()
        out["corpus_siib_haspi_estoi_utts_per_sec_warm"] = round(
            reps[len(reps) // 2], 2)
        out["corpus_warm_utts_per_sec_min"] = round(reps[0], 2)
        out["corpus_warm_utts_per_sec_max"] = round(reps[-1], 2)
        # device-time-only variant: the same warm rep with per-section
        # fetch barriers; the sum of metric sections is host-independent
        # (bounded by device execution + one fetch each), making rounds
        # comparable across driver hosts with different CPU/tunnel load
        os.environ["NELE_SCORE_TIMING"] = "1"
        try:
            from nelegan_tpu import metrics as _m
            # one probe-warming rep (the first pays one probe compile per
            # distinct barrier shape — BENCH_r03's estoi_s=0.852 artifact),
            # then THREE timing reps keeping per-section MINIMA: each
            # section is device execution + one bounded fetch, so its min
            # over reps filters tunnel service-load spikes (measured 10x;
            # BENCH_r04's first cut recorded estoi_s=0.232 from one spiked
            # rep where tools/prof_estoi.py shows the whole warm ESTOI
            # chain is RTT-bound at ~27 ms)
            score_corpus(cs, ns, es, norm=False, metrics=sm,
                         clean_cache=pool, clean_keys=ks)
            timing_min: dict = {}
            for _ in range(3):
                score_corpus(cs, ns, es, norm=False, metrics=sm,
                             clean_cache=pool, clean_keys=ks)
                for k, v in _m.LAST_TIMING.items():
                    if isinstance(v, float):
                        timing_min[k] = min(v, timing_min.get(k, v))
            dev_s = sum(v for k, v in timing_min.items()
                        if k[:-2] in sm)  # metric sections only: device
            # execution + one bounded fetch each; excludes host pack/VAD
            # and tunnel transfer (upload_s/fetch_s), which vary with the
            # driver box
            if dev_s > 0:
                out["corpus_warm_device_utts_per_sec"] = round(8 / dev_s, 2)
            out["corpus_warm_timing"] = timing_min
        finally:
            del os.environ["NELE_SCORE_TIMING"]
    except Exception as e:
        out["corpus_scoring_error"] = str(e)[:120]
    return out


def main():
    from nelegan_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    try:
        base = get_baseline()
    except Exception as e:  # reference mount unavailable
        base = {"utts_per_sec": None, "error": str(e)}
    ours = measure_ours()
    env = measure_env()
    try:
        extras = measure_extras()
    except Exception as e:
        extras = {"extras_error": str(e)}
    vs = (ours["utts_per_sec"] / base["utts_per_sec"]
          if base.get("utts_per_sec") else None)
    # training + metric-eval ratios vs the measured reference baselines
    # (BASELINE.json configs 3-5, tools/measure_baseline.py): utterance
    # rates — the reference trains batch-1 (train_nele.py:38), we batch 8
    if base.get("gan_utts_per_sec") and extras.get("gan_utts_per_sec"):
        extras["gan_vs_baseline"] = round(
            extras["gan_utts_per_sec"] / base["gan_utts_per_sec"], 2)
        extras["baseline_gan_utts_per_sec"] = base["gan_utts_per_sec"]
    if base.get("haspi_scores_per_sec") and extras.get(
            "haspi_scores_per_sec"):
        extras["haspi_vs_baseline"] = round(
            extras["haspi_scores_per_sec"] / base["haspi_scores_per_sec"], 1)
        extras["baseline_haspi_scores_per_sec"] = \
            base["haspi_scores_per_sec"]
    print(json.dumps({
        "metric": "enhanced_utterances_per_sec",
        "value": round(ours["utts_per_sec"], 2),
        "unit": "utt/s (2.1 s, 16 kHz, incl. IMCRA featurization)",
        "vs_baseline": round(vs, 2) if vs else None,
        "baseline_utts_per_sec": base.get("utts_per_sec"),
        "batch": BATCH,
        "ms_per_batch": round(ours["ms_per_batch"], 2),
        "mfu_enhance": ours.get("mfu_enhance"),
        "flops_per_batch": ours.get("flops_per_batch"),
        "device_resident_utts_per_sec":
            ours.get("device_resident_utts_per_sec"),
        "device_resident_batch": ours.get("device_resident_batch"),
        "mfu_enhance_device_resident":
            ours.get("mfu_enhance_device_resident"),
        "platform": ours["platform"],
        **env,
        **extras,
    }))


if __name__ == "__main__":
    main()
