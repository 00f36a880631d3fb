"""Fit the ViSQOL NSIM -> MOS-LQO map against the package's P.862 scale.

Why: the upstream ViSQOL binary maps NSIM to MOS-LQO with a shipped SVR
(/root/reference/audio_util.py:233-236) that we cannot run (zero egress),
and the reference then calibrates raw MOS through the logistic
1/(1+exp(-2.5*(x-2.2))) (audio_util.py:259-262) before the quality
discriminator consumes it.  For those calibrated targets to be informative
the NSIM->MOS map must place GAN-regime degradations around MOS ~2.2 —
round 2's hand-fitted map put nearly the whole degradation grid at
calibrated ~1.0 (saturated targets, VERDICT r2 "Missing #1").

Anchor: this package's full P.862 implementation (metrics/pesq.py) is the
one quality scale here with quantified fidelity (0.000 dMOS table drift vs
an independent derivation, CALIBRATION.md §2).  We compute (NSIM,
P.862.2 MOS-LQO) pairs over a degradation grid spanning what the GAN loop
produces — per-band gain resynthesis (the generator's actual operation),
DRC, clipping, filtering, additive noise — and least-squares fit

    mos(nsim) = 1 + A / (1 + exp(-K * (nsim - C))),  A = 3.73 fixed

(4.73 ceiling = ViSQOL speech mode's identity score).  ViSQOL keeps its own
structure (gammatone NSIM + patch alignment); the map is only a monotone
rescale pinning its absolute level to a validated MOS scale.

Run on CPU (a few minutes):  python tools/fit_visqol_map.py
Prints fitted (K, C) for metrics/visqol.py and the calibrated-occupancy
diagnostics under the reference constants (a=-2.5, b=2.2).
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

FS = 16000


def _band_gain_deg(x: np.ndarray, strength: float, seed: int) -> np.ndarray:
    """Generator-shaped degradation: random smooth per-band energy gains
    exp(strength * tanh(g)) applied through the package's own resynthesis
    (dsp/features.resynthesize) — exactly the class of signal the quality
    discriminator scores during training."""
    import jax.numpy as jnp
    from nelegan_tpu.dsp.stft import stft
    from nelegan_tpu.dsp.features import resynthesize

    spec = np.asarray(stft(jnp.asarray(x)))
    t = spec.shape[-1]
    rng = np.random.default_rng(seed)
    knots = rng.standard_normal((max(t // 8, 2) + 2, 64))
    ti = np.linspace(0, knots.shape[0] - 1, t)
    g = np.stack([np.interp(ti, np.arange(knots.shape[0]), knots[:, b])
                  for b in range(64)], axis=1)           # [T, 64]
    alpha2 = np.exp(strength * np.tanh(g)).astype(np.float64)
    y = np.asarray(resynthesize(jnp.asarray(alpha2), jnp.abs(spec),
                                jnp.angle(spec)))
    y = y / max(np.sqrt((y ** 2).mean()), 1e-12) * 0.03
    return y[:len(x)]


def _fir_lowpass(x: np.ndarray, fc: float) -> np.ndarray:
    from scipy.signal import firwin, lfilter
    return lfilter(firwin(65, fc / (FS / 2)), [1.0], x)


def build_grid():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from calibration_audit import _speech_signals, _drc, _mix

    pairs = []   # (condition, clean, degraded)
    for name, clean, noise in _speech_signals():
        clean = clean / max(np.sqrt((clean ** 2).mean()), 1e-12) * 0.03
        pairs.append((f"{name}/identity", clean, clean.copy()))
        for s in (0.3, 0.8, 1.6, 3.2):
            pairs.append((f"{name}/bandgain{s}", clean,
                          _band_gain_deg(clean, s, seed=int(s * 10))))
        pairs.append((f"{name}/drc", clean, _drc(clean)))
        for frac in (0.5, 0.15, 0.05):
            thr = frac * np.abs(clean).max()
            pairs.append((f"{name}/clip{frac}", clean,
                          np.clip(clean, -thr, thr)))
        for fc in (3400.0, 2000.0, 1000.0):
            pairs.append((f"{name}/lp{fc:.0f}", clean,
                          _fir_lowpass(clean, fc)))
        for snr in (30.0, 20.0, 10.0, 5.0, 0.0, -5.0):
            pairs.append((f"{name}/noisy{snr:+.0f}", clean,
                          clean + _mix(clean, noise, snr)))
        pairs.append((f"{name}/drc+noisy10", clean,
                      _drc(clean) + _mix(clean, noise, 10.0)))
    return pairs


def collect(pairs):
    import jax.numpy as jnp
    from nelegan_tpu.metrics.visqol import visqol_nsim_16k
    from nelegan_tpu.metrics.pesq import pesq_p862_16k, mos_lqo_wb

    rows = []
    for cond, c, d in pairs:
        n = min(len(c), len(d))
        cj = jnp.asarray(c[:n])
        dj = jnp.asarray(d[:n])
        nsim = float(visqol_nsim_16k(cj, dj))
        mos = float(mos_lqo_wb(pesq_p862_16k(cj, dj, jnp.int32(n))))
        rows.append((cond, nsim, mos))
        print(f"  {cond:32s} nsim={nsim:.4f} pesq_moslqo={mos:.3f}",
              flush=True)
    return rows


def fit(rows, a_fixed: float = 3.73):
    """Fit MOS_Q in mos = 1 + A*exp(Q*(nsim-1)) — the upstream SVR's
    hockey-stick shape with the 4.73 identity ceiling pinned exactly.

    Only ADDITIVE-NOISE and CLIPPING rows anchor the fit: those are the
    degradation classes where ViSQOL and PESQ are known to agree (both
    are full-reference models of audible distortion).  Lowpass rows are
    excluded because ViSQOL punishes bandwidth limitation far harder than
    PESQ by design (spectral-similarity vs disturbance model); bandgain /
    DRC rows are excluded because PESQ's gain-compensation stages forgive
    recoloring that ViSQOL's NSIM (by design) scores as dissimilarity —
    anchoring either class to PESQ would bias the map toward PESQ's
    behavior on exactly the signals where the two engines diverge."""
    from scipy.optimize import curve_fit

    keep = [r for r in rows if "/noisy" in r[0] or "/clip" in r[0]]
    keep = [r for r in keep if "drc" not in r[0]]
    nsim = np.array([r[1] for r in keep])
    mos = np.array([r[2] for r in keep])

    def f(n, q):
        return 1.0 + a_fixed * np.exp(q * (n - 1.0))

    (q,), _ = curve_fit(f, nsim, mos, p0=(8.0,), maxfev=20000)
    resid = f(nsim, q) - mos
    return q, f, float(np.sqrt((resid ** 2).mean()))


def main():
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dump", default=None, metavar="PATH",
                    help="also write the (condition, nsim, pesq_mos) fit "
                         "grid as JSON (committed as tests/goldens/"
                         "visqol_fit_grid.json — the regression anchor "
                         "that pins MOS_Q and the calibration centre, "
                         "tests/test_visqol.py)")
    args = ap.parse_args()
    print("building degradation grid ...")
    pairs = build_grid()
    print(f"{len(pairs)} pairs; scoring ...")
    rows = collect(pairs)
    if args.dump:
        import json
        with open(args.dump, "w") as fjson:
            json.dump({"rows": [{"cond": c, "nsim": n, "pesq_mos": m}
                                for c, n, m in rows],
                       "fit_classes": "noisy+clip, drc excluded",
                       "map": "mos = 1 + MOS_A*exp(MOS_Q*(nsim-1))"},
                      fjson, indent=1)
        print(f"grid dumped to {args.dump}")
    q, f, rmse = fit(rows)
    print(f"\nfit (lp rows excluded): MOS_A=3.73  MOS_Q={q:.3f}  "
          f"rmse={rmse:.3f}")

    # occupancy of the calibrated score under the reference constants
    a_ref, b_ref = -2.5, 2.2
    mos_fit = np.clip(f(np.array([r[1] for r in rows]), q), 1.0, 4.73)
    cal = 1.0 / (1.0 + np.exp(a_ref * (mos_fit - b_ref)))
    inband = float(np.mean((cal > 0.05) & (cal < 0.95)))
    print(f"calibrated (a=-2.5, b=2.2): median={np.median(cal):.3f} "
          f"p5={np.percentile(cal, 5):.3f} p95={np.percentile(cal, 95):.3f} "
          f"frac in [0.05,0.95]={inband:.2f}")
    gan = [r for r in rows if "bandgain" in r[0] or "drc" in r[0]]
    mos_gan = np.clip(f(np.array([r[1] for r in gan]), q), 1.0, 4.73)
    cal_gan = 1.0 / (1.0 + np.exp(a_ref * (mos_gan - b_ref)))
    gan_inband = float(np.mean((cal_gan > 0.05) & (cal_gan < 0.95)))
    print(f"GAN-regime rows (bandgain/drc): frac in band={gan_inband:.2f} "
          f"median={np.median(cal_gan):.3f}")
    ident = [r for r in rows if "identity" in r[0]]
    print("identity pairs map to:",
          [round(float(f(r[1], q)), 3) for r in ident])

    # --- calibration-centre refit -------------------------------------
    # Keep the reference's logistic shape and slope (a=-2.5,
    # audio_util.py:259-262) but re-centre b at the median fitted MOS of
    # the DEGRADED grid rows, so the sigmoid's informative band covers
    # what the GAN actually produces instead of the reference binary's
    # corpus distribution.  Identity rows must still calibrate ~1.
    deg = [r for r in rows if "identity" not in r[0]]
    mos_deg = np.clip(f(np.array([r[1] for r in deg]), q), 1.0, 4.73)
    b_new = round(float(np.median(mos_deg)), 2)
    for tag, sub_mos in (("all-degraded", mos_deg), ("gan-regime", mos_gan)):
        cal2 = 1.0 / (1.0 + np.exp(a_ref * (sub_mos - b_new)))
        inband2 = float(np.mean((cal2 > 0.05) & (cal2 < 0.95)))
        print(f"refit b={b_new}: {tag:12s} frac in band={inband2:.2f} "
              f"median={np.median(cal2):.3f} "
              f"p5={np.percentile(cal2, 5):.3f} "
              f"p95={np.percentile(cal2, 95):.3f}")
    mos_id = np.clip(f(np.array([r[1] for r in ident]), q), 1.0, 4.73)
    cal_id = 1.0 / (1.0 + np.exp(a_ref * (mos_id - b_new)))
    print(f"refit b={b_new}: identity calibrates to "
          f"{[round(float(v), 3) for v in cal_id]}")
    print(f"\n==> metrics/visqol.py:  MOS_Q = {q:.2f}")
    print(f"==> config.MetricCalibration.visqol = (-2.5, {b_new})")


if __name__ == "__main__":
    main()
