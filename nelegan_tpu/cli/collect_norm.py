"""Metric-normalization data collector — the `python intel.py` __main__
equivalent (reference: intel.py:162-274): scores a sample of training
utterances before/after pre-enhancement, with and without reverberation, and
saves the score distributions as .npy files under ./metric_norm/.

Like the reference (which collects through the mapped *_Wrapper_harvard
functions, intel.py:225-238), the default saves CALIBRATED scores — useful
for checking that the current logistic constants spread the corpus over
[0, 1].  To refit the constants themselves (config.MetricCalibration),
pass --raw: fitting (a, b) needs unmapped scores.

    python -m nelegan_tpu.cli.collect_norm \
        --clean .../Train/Clean --noise .../Train/Noise \
        --enhanced .../Train/MultiEnh [--rir-dir .../RIR_DB16k] \
        [--num 1500] [--out ./metric_norm]
"""
from __future__ import annotations

import argparse
import os
import random


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clean", required=True)
    p.add_argument("--noise", required=True)
    p.add_argument("--enhanced", required=True)
    p.add_argument("--rir-dir", default=None,
                   help="RIR corpus; file chosen by the clean name's "
                        "#<rir>...# field like the reference")
    p.add_argument("--num", type=int, default=1500)
    p.add_argument("--out", default="./metric_norm")
    p.add_argument("--metrics", default="estoi,haspi,siib")
    p.add_argument("--raw", action="store_true",
                   help="save unmapped scores (for refitting the logistic "
                        "calibration constants)")
    p.add_argument("--seed", type=int, default=666)
    p.add_argument("--tau", type=int, default=32)
    p.add_argument("--platform", default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax.numpy as jnp
    from nelegan_tpu.data.pipeline import get_filepaths
    from nelegan_tpu.data.wavio import read_wav
    from nelegan_tpu.dsp.reverb import fir_filter, direct_path_rir
    from nelegan_tpu.metrics import estoi, siib, haspi_v2
    from nelegan_tpu.metrics.calibrate import make_mappers_np

    metrics = tuple(m.strip() for m in args.metrics.split(",") if m.strip())
    mappers = make_mappers_np()  # host-side maps: no device round trips

    def score(m, x, y):
        if m == "estoi":
            raw = float(estoi(x, y, 16000))
        elif m == "siib":
            raw = float(siib(x, y, 16000))
        elif m == "haspi":
            raw = float(haspi_v2(x, 16000, y, 16000)[0])
        else:
            raise ValueError(m)
        return raw if args.raw else float(mappers[m](raw))

    files = sorted(get_filepaths(args.clean))
    random.Random(args.seed).shuffle(files)
    files = files[: args.num]
    rms = lambda v: np.sqrt(np.mean(v ** 2))

    acc = {}  # (metric, condition) -> list
    for i, path in enumerate(files):
        base = os.path.basename(path)
        clean, _ = read_wav(path)
        noise, _ = read_wav(os.path.join(args.noise, base))
        enhan, _ = read_wav(os.path.join(args.enhanced, base))
        n = min(len(clean), len(noise), len(enhan))
        clean, noise, enhan = clean[:n], noise[:n], enhan[:n]

        pairs = {"before": (clean, clean + noise),
                 "after": (clean, enhan + noise)}

        if args.rir_dir:
            rirname = base.split("#")[1] + ".wav"
            rir, _ = read_wav(os.path.join(args.rir_dir, rirname))
            b = int(np.argmax(rir))
            h_direct = direct_path_rir(rir, args.tau)
            direct = np.asarray(fir_filter(jnp.asarray(h_direct),
                                           jnp.asarray(clean)))
            direct = direct / rms(direct) * 0.03
            reverb = np.asarray(fir_filter(jnp.asarray(rir),
                                           jnp.asarray(clean)))
            reverb = reverb / rms(reverb) * 0.03
            reverb_enh = np.asarray(fir_filter(jnp.asarray(rir),
                                               jnp.asarray(enhan)))
            reverb_enh = reverb_enh / rms(reverb_enh) * 0.03
            pairs["rev_before"] = (direct[b:], reverb[b:] + noise[b:])
            pairs["rev_after"] = (direct[b:], reverb_enh[b:] + noise[b:])

        for cond, (x, y) in pairs.items():
            for m in metrics:
                acc.setdefault((m, cond), []).append(score(m, x, y))
        if i % 10 == 0:
            print(f"{i} finished")

    os.makedirs(args.out, exist_ok=True)
    for (m, cond), vals in acc.items():
        np.save(os.path.join(args.out, f"{m}_{cond}.npy"),
                np.asarray(vals))
    print(f"saved {len(acc)} distributions to {args.out}")


if __name__ == "__main__":
    main()
