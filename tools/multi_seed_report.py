"""Multi-seed GAN training campaign: quantify run noise + config A/Bs.

Round-3 VERDICT items 4+7: the bf16-parity and "+12-24% all five
metrics" results each rested on ONE seed, and the production-default
config (batch 8, f32) idles the chip at MFU 0.11 while a measured 0.25
config (batch 64, bf16) was one flag away — but its training quality was
unproven.  This campaign runs N seeds for each config variant at a fixed
reference-shaped scale (every phase of train_nele.py:110-429 per epoch)
and reports per-metric best-epoch mean +/- spread, so

  1. the five-metric gains can be compared against seed noise, and
  2. the batch/dtype default can be flipped (or kept) on quality
     evidence, not a single-run anecdote.

Results are written incrementally to <out>/multiseed.json after every
run, and MULTISEED.md is re-rendered — a killed campaign loses nothing.

Usage (on the TPU box; ~10-15 min per run at the default scale):
    python tools/multi_seed_report.py \
        [--seeds 101,202,303] [--epochs 50] [--variants b8_f32,b64_bf16] \
        [--corpus /tmp/nele_ms_corpus] [--out artifacts/train_report]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

METRICS = ("siib", "haspi", "estoi", "pesq", "visqol")

# variant -> (batch_size, compute_dtype, lr_g multiplier, D metric set)
# (validation always scores all five metrics, so variants that train
# without a metric still report it — the A/B outcome measure is shared)
VARIANTS = {
    "b8_f32": (8, "float32", 1.0, METRICS),  # shipped default
    "b64_bf16": (64, "bfloat16", 1.0, METRICS),  # fed-chip candidate
    "b64_bf16_lr4x": (64, "bfloat16", 4.0, METRICS),  # lr scaling probe
    # round-4 VERDICT weak #5: ViSQOL contributed ~0 training signal
    # (+0.8 +/- 1.1% across all seeds/configs) — does dropping its D_Qua
    # column (train/loop.py per-column gating) change anything?
    "b8_f32_novisqol": (8, "float32", 1.0,
                        ("siib", "haspi", "estoi", "pesq")),
}


def run_one(corpus: str, run_dir: str, seed: int, epochs: int,
            n_sampling: int, n_valid: int, batch: int, dtype: str,
            lr_mult: float, train_metrics=METRICS) -> dict:
    from nelegan_tpu.config import Config, ModelConfig, TrainConfig
    from nelegan_tpu.train.loop import Trainer, TrainPaths

    tc = TrainConfig(gan_epochs=epochs, num_sampling=n_sampling,
                     num_valid=n_valid, batch_size=batch, seed=seed)
    if lr_mult != 1.0:
        tc = dataclasses.replace(tc, lr_g=tc.lr_g * lr_mult)
    cfg = Config(train=tc, model=ModelConfig(compute_dtype=dtype))
    paths = TrainPaths(
        train_clean=os.path.join(corpus, "Train", "Clean"),
        train_noise=os.path.join(corpus, "Train", "Noise"),
        test_clean=os.path.join(corpus, "Test", "Clean"),
        test_noise=os.path.join(corpus, "Test", "Noise"),
        train_enhanced=os.path.join(corpus, "Train", "MultiEnh"),
        output=os.path.join(run_dir, "output"),
        checkpoints=os.path.join(run_dir, "chkpt"),
        log_file=os.path.join(run_dir, "log.txt"))
    # the tunnel occasionally drops a remote compile mid-call (observed:
    # "response body closed before all bytes were read" on the campaign's
    # very first run) — wrap each run in the package's elastic recovery so
    # a multi-hour campaign resumes from the per-epoch checkpoints instead
    # of dying.  The epoch-0 baseline is persisted beside the checkpoints:
    # a resumed attempt (start_epoch > 1) must not re-measure it.
    from nelegan_tpu.train.resilience import run_with_recovery
    os.makedirs(run_dir, exist_ok=True)
    base_path = os.path.join(run_dir, "baseline.json")

    def make_trainer():
        trainer = Trainer(paths, cfg, metric_set=train_metrics,
                          valid_metric_set=METRICS)
        if trainer.start_epoch == 1 and not os.path.exists(base_path):
            baseline = trainer.validate(epoch=0)
            for m in METRICS:
                if trainer.history.get(m):
                    trainer.history[m].pop()
            with open(base_path, "w") as f:
                json.dump(baseline, f)
        return trainer

    t0 = time.time()
    trainer = run_with_recovery(make_trainer, epochs)
    wall = time.time() - t0
    with open(base_path) as f:
        baseline = json.load(f)
    history = {m: list(v) for m, v in trainer.history.items()}
    best = {m: float(max(v)) for m, v in history.items() if v}
    best_ep = {m: int(max(range(len(v)), key=lambda i: v[i])) + 1
               for m, v in history.items() if v}
    return {"seed": seed, "baseline": baseline, "best": best,
            "best_epoch": best_ep, "history": history,
            "wall_s": round(wall, 1), "s_per_epoch": round(wall / epochs, 2)}


def render_md(results: dict, out_md: str) -> None:
    lines = ["# Multi-seed training campaign",
             "",
             f"Scale: {results['epochs']} epochs x "
             f"{results['n_sampling']} sampled utterances/epoch, "
             f"{results['n_valid']} validation utterances, 3 D passes, all "
             "5 metrics scored every epoch (reference train_nele.py scale "
             "on the synthetic corpus).  Regenerate: "
             "`python tools/multi_seed_report.py`.",
             ""]
    for variant, runs in results["variants"].items():
        if not runs:
            continue
        b, dt, lrm, tms = VARIANTS[variant]
        lines += [f"## {variant} (batch {b}, {dt}"
                  + (f", lr_g x{lrm:g}" if lrm != 1.0 else "")
                  + (f", D trains on {'/'.join(tms)}"
                     if tms != METRICS else "") + ")",
                  "",
                  f"{len(runs)} seeds: "
                  + ", ".join(str(r['seed']) for r in runs)
                  + f"; {runs[0]['s_per_epoch']:.1f}-"
                    f"{runs[-1]['s_per_epoch']:.1f} s/epoch",
                  "",
                  "| metric | untrained (mean) | best (mean +/- spread) "
                  "| gain % (mean +/- spread) | min gain % |",
                  "|---|---|---|---|---|"]
        import numpy as np
        for m in METRICS:
            base = np.array([r["baseline"][m] for r in runs])
            best = np.array([r["best"][m] for r in runs])
            gain = 100.0 * (best - base) / np.maximum(np.abs(base), 1e-9)
            lines.append(
                f"| {m} | {base.mean():.4f} | {best.mean():.4f} "
                f"+/- {best.std():.4f} | {gain.mean():+.1f} "
                f"+/- {gain.std():.1f} | {gain.min():+.1f} |")
        lines.append("")
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seeds", default="101,202,303")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--variants", default="b8_f32,b64_bf16")
    p.add_argument("--corpus", default="/tmp/nele_ms_corpus")
    p.add_argument("--n-train", type=int, default=64)
    p.add_argument("--n-valid", type=int, default=8)
    p.add_argument("--out", default=os.path.join(REPO, "artifacts",
                                                 "train_report"))
    p.add_argument("--platform", default=None)
    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from make_training_report import ensure_corpus
    ensure_corpus(args.corpus, args.n_train, 16, 1234)
    os.makedirs(args.out, exist_ok=True)
    out_json = os.path.join(args.out, "multiseed.json")
    results = {"epochs": args.epochs, "n_sampling": args.n_train,
               "n_valid": args.n_valid, "variants": {}}
    if os.path.exists(out_json):        # resume a killed campaign
        with open(out_json) as f:
            prev = json.load(f)
        if (prev.get("epochs") == args.epochs
                and prev.get("n_sampling") == args.n_train):
            results = prev

    seeds = [int(s) for s in args.seeds.split(",") if s]
    # seed-outer, variant-inner: the defaults decision (VERDICT item 4)
    # compares variants WITHIN a seed, so a campaign cut short by the round
    # clock still yields complete A/B pairs for the seeds it finished
    for seed in seeds:
        for variant in args.variants.split(","):
            b, dt, lrm, tms = VARIANTS[variant]
            runs = results["variants"].setdefault(variant, [])
            done = {r["seed"] for r in runs}
            if seed in done:
                print(f"[skip] {variant} seed {seed} (already recorded)",
                      flush=True)
                continue
            # key the run dir by the campaign scale too: a same-variant
            # run at another (epochs, n_train) must NOT resume this one's
            # checkpoints (Trainer auto-resumes from paths.checkpoints)
            run_dir = os.path.join(
                "/tmp/nele_ms_runs",
                f"{variant}_s{seed}_{args.epochs}ep_{args.n_train}n")
            print(f"[run] {variant} seed {seed} ...", flush=True)
            r = run_one(args.corpus, run_dir, seed, args.epochs,
                        args.n_train, args.n_valid, b, dt, lrm, tms)
            runs.append(r)
            with open(out_json, "w") as f:
                json.dump(results, f, indent=1)
            render_md(results, os.path.join(args.out, "MULTISEED.md"))
            print(f"[done] {variant} seed {seed}: best "
                  + ", ".join(f"{m}={r['best'][m]:.3f}" for m in METRICS)
                  + f" ({r['wall_s']:.0f} s)", flush=True)
    print("campaign complete:", out_json, flush=True)


if __name__ == "__main__":
    main()
