"""Reference-scale corpus-scoring measurement with per-section timing.

Reproduces the training loop's score_for_d phase in isolation: N
utterances through score_corpus with all five metrics and the clean-side
pool, one cold pass (fills pools, pays remote compiles) and `--warm`
steady-state passes.  NELE_SCORE_TIMING section splits are printed per
pass — note the splits are measured with real-fetch barriers that
serialise host and device, so the SPLIT is meaningful but their sum
exceeds the production total (metrics/__init__.py:170).

Usage: python tools/measure_score.py CORPUS_DIR [--n 300] [--warm 2]
       (CORPUS_DIR from tools/make_synth_corpus.py, or any
        Train/Clean + Train/Noise tree)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("NELE_SCORE_TIMING", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("corpus")
    p.add_argument("--n", type=int, default=300)
    p.add_argument("--warm", type=int, default=2)
    p.add_argument("--metrics", default="siib,haspi,estoi,pesq,visqol")
    args = p.parse_args(argv)

    from nelegan_tpu.data.wavio import read_wav
    from nelegan_tpu import metrics as M
    from nelegan_tpu.metrics import score_corpus
    from nelegan_tpu.metrics.clean_pool import CleanSidePool

    cdir = os.path.join(args.corpus, "Train/Clean")
    ndir = os.path.join(args.corpus, "Train/Noise")
    names = sorted(os.listdir(cdir))[: args.n]
    clean = [read_wav(os.path.join(cdir, f))[0] for f in names]
    noise = [read_wav(os.path.join(ndir, f))[0] for f in names]
    # stand-in enhanced signal: a mild spectral tilt of clean,
    # PCM16-rounded exactly like the files the real loop scores
    enh = [np.round((c * 0.92 + np.roll(c, 1) * 0.05) * 32768)
           .astype(np.int16).astype(np.float32) / 32768 for c in clean]

    pool = CleanSidePool()
    keys = names
    mets = tuple(m for m in args.metrics.split(",") if m)
    for label in ["cold"] + [f"warm{i + 1}" for i in range(args.warm)]:
        M.LAST_TIMING = None
        t0 = time.perf_counter()
        score_corpus(clean, noise, enh, norm=True, metrics=mets,
                     clean_cache=pool, clean_keys=keys)
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f}s for {len(clean)} utts "
              f"({len(clean) / dt:.1f} utt/s)")
        t = getattr(M, "LAST_TIMING", None)
        if t:
            print("  split: " + " ".join(
                f"{k}={v:.2f}" for k, v in sorted(t.items())))


if __name__ == "__main__":
    main()
