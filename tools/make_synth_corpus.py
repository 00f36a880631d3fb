"""Generate a synthetic speech/noise corpus in the reference's data layout.

The reference trains on the Harvard_SI corpus (reference train_nele.py:30-68),
which is not redistributable; this tool fabricates a statistically
speech-like stand-in so the full training loop can be exercised at scale:

  Train/Clean, Train/Noise, Train/MultiEnh, Test/Clean, Test/Noise

"Speech": harmonic series with a drifting f0, formant-like spectral
envelope, and syllabic amplitude modulation.  "Noise": per-utterance choice
of white / pink / babble-like (sum of speech processes) / hum, at a random
SNR.  "MultiEnh" (the reference's SSDRC pre-enhanced parallel corpus,
train_nele.py:60-63): a fixed high-frequency-emphasis + dynamic range
compression of the clean signal — the same role (a non-GAN enhancement
baseline the discriminators also score), not the same algorithm.

Usage: python tools/make_synth_corpus.py OUT_DIR [--n-train 64]
       [--n-test 16] [--seed 0]
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from scipy.signal import lfilter

FS = 16000
RMS = 0.03
NOISE_TYPES = ("White", "Pink", "Babble", "Hum")


def _rms_norm(x: np.ndarray, rms: float = RMS) -> np.ndarray:
    return x / max(np.sqrt((x ** 2).mean()), 1e-12) * rms


def synth_speech(rng: np.random.Generator, dur: float) -> np.ndarray:
    n = int(dur * FS)
    t = np.arange(n) / FS
    f0 = rng.uniform(90, 220) * (1.0 + 0.12 * np.sin(
        2 * np.pi * rng.uniform(0.2, 0.6) * t + rng.uniform(0, 6.3)))
    phase = np.cumsum(2 * np.pi * f0 / FS)
    x = np.zeros(n)
    # formant-ish envelope: three resonances with random centres
    formants = rng.uniform([300, 900, 2200], [800, 1800, 3400])
    for k in range(1, 40):
        fk = k * np.mean(f0)
        if fk > 7000:
            break
        amp = sum(np.exp(-0.5 * ((fk - fc) / 300.0) ** 2) for fc in formants)
        x += (amp + 0.05) / k * np.sin(k * phase)
    # syllabic (3-5 Hz) and phrase-level modulation, with pauses
    syl = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2.5, 5.0) * t
                            + rng.uniform(0, 6.3)))
    gate = (np.sin(2 * np.pi * rng.uniform(0.3, 0.7) * t
                   + rng.uniform(0, 6.3)) > -0.7).astype(float)
    gate = lfilter([0.002], [1, -0.998], gate)  # smooth the gate edges
    x *= (0.15 + syl) * gate
    # light consonant-like noise bursts
    burst = rng.standard_normal(n) * (syl > 0.9) * 0.2
    return _rms_norm(x + burst)


def synth_noise(rng: np.random.Generator, kind: str, n: int) -> np.ndarray:
    if kind == "White":
        v = rng.standard_normal(n)
    elif kind == "Pink":
        v = lfilter([0.049922, -0.095993, 0.050612, -0.004408],
                    [1, -2.494956, 2.017265, -0.522189],
                    rng.standard_normal(n))
    elif kind == "Babble":
        v = sum(synth_speech(rng, n / FS)[:n] for _ in range(6))
    else:  # Hum
        t = np.arange(n) / FS
        v = (np.sin(2 * np.pi * 100 * t) + 0.5 * np.sin(2 * np.pi * 200 * t)
             + 0.2 * rng.standard_normal(n))
    return _rms_norm(np.asarray(v)[:n])


def ssdrc_like(x: np.ndarray) -> np.ndarray:
    """Fixed spectral-shaping + compression 'pre-enhanced' variant."""
    emphasized = lfilter([1.0, -0.85], [1.0], x)  # HF emphasis
    env = np.sqrt(lfilter([0.001], [1, -0.999], emphasized ** 2) + 1e-12)
    compressed = emphasized * (env + 1e-4) ** -0.5 * 3e-2
    return _rms_norm(compressed)


def write_wav(path: str, x: np.ndarray):
    import scipy.io.wavfile as wavfile
    wavfile.write(path, FS, (np.clip(x, -1, 1) * 32767).astype(np.int16))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--n-train", type=int, default=64)
    ap.add_argument("--n-test", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    rng = np.random.default_rng(args.seed)

    for split, count in (("Train", args.n_train), ("Test", args.n_test)):
        for sub in ("Clean", "Noise") + (("MultiEnh",)
                                         if split == "Train" else ()):
            os.makedirs(os.path.join(args.out, split, sub), exist_ok=True)
        for i in range(count):
            dur = rng.uniform(1.5, 3.0)
            speech = synth_speech(rng, dur)
            kind = NOISE_TYPES[i % len(NOISE_TYPES)]
            snr_tag = int(rng.choice([-11, -7, -3]))
            noise = synth_noise(rng, kind, len(speech))
            # the stored noise embodies the named SNR relative to the
            # RMS-0.03 speech (reference file naming name#NoiseType#SNR.wav;
            # the pipeline mixes clean + noise as-is, never re-scales)
            name = f"s_{split.lower()}_{i:04d}#{kind}#{snr_tag}.wav"
            write_wav(os.path.join(args.out, split, "Clean", name), speech)
            write_wav(os.path.join(args.out, split, "Noise", name),
                      _rms_norm(noise) * 10 ** (-snr_tag / 20.0))
            if split == "Train":
                write_wav(os.path.join(args.out, split, "MultiEnh", name),
                          ssdrc_like(speech))
    print(f"wrote {args.n_train} train + {args.n_test} test utterances "
          f"to {args.out}")


if __name__ == "__main__":
    main()
