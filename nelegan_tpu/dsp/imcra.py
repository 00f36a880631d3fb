"""IMCRA noise-PSD estimation as a single fused `lax.scan` over STFT frames.

Re-architecture of the reference's per-frame Python loop
(reference: noise_est/imcra.py:363-484 `imcra.update`,
 noise_est/imcra.py:521-577 `imcra_est.estimate`): the whole
Cohen-2003 improved minima-controlled recursive averaging recursion —
decision-directed a-priori SNR, double minimum-statistics VAD,
speech-presence probability, and bias-corrected noise PSD — runs as one
`lax.scan` whose carry holds every recursive quantity, including the U-slot
minimum-tracking ring buffers.  All 257 frequency bins update vectorised on
the VPU each step; utterance batching is a `vmap` on top.

Semantics preserved (including reference quirks that matter for parity):
  * the first frame initialises the smoothed buffers from itself and is then
    *also* processed by the warm-up branch (imcra.py:377-398);
  * during the IS warm-up frames only `Lambda_D` is smoothed — the biased
    estimate `ov_Lambda_D` keeps its frame-0 value until the main branch
    first runs (imcra.py:384-398 vs 446);
  * the emitted PSD for frame l is `Lambda_D` *after* the update
    (imcra.py:568-571);
  * minimum tracking fires every V-th main-branch frame, storing the running
    window minimum into a U-deep buffer before the min is re-taken over the
    `min(u+1, U)` filled slots (imcra.py:450-481).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nelegan_tpu.config import ImcraConfig

_TINY = 1e-30


def _fsmooth(p: jnp.ndarray) -> jnp.ndarray:
    """Frequency smoothing with a normalized 3-tap raised-cosine window.

    Interior bins use weights [1/4, 1/2, 1/4]; edge bins renormalise over the
    in-range taps to [2/3, 1/3] (reference: imcra.py:259-268, 335-336).
    """
    up = jnp.concatenate([p[1:], jnp.zeros_like(p[:1])])     # p[k+1]
    down = jnp.concatenate([jnp.zeros_like(p[:1]), p[:-1]])  # p[k-1]
    s = 0.25 * down + 0.5 * p + 0.25 * up
    s = s.at[0].set(p[0] * (2.0 / 3.0) + p[1] * (1.0 / 3.0))
    s = s.at[-1].set(p[-2] * (1.0 / 3.0) + p[-1] * (2.0 / 3.0))
    return s


class _State(NamedTuple):
    s: jnp.ndarray            # smoothed spectrogram, first iteration [K]
    ts: jnp.ndarray           # smoothed spectrogram, second iteration [K]
    smin: jnp.ndarray         # running minimum [K]
    tsmin: jnp.ndarray
    smin_sw: jnp.ndarray      # sub-window running minimum [K]
    tsmin_sw: jnp.ndarray
    store: jnp.ndarray        # minimum-tracking buffer [U, K]
    tstore: jnp.ndarray
    ov_lam: jnp.ndarray       # biased noise PSD [K]
    lam: jnp.ndarray          # bias-corrected noise PSD [K]
    gain: jnp.ndarray         # Wiener gain from the decision-directed rule [K]
    gamma: jnp.ndarray        # a-posteriori SNR [K]
    j: jnp.ndarray            # V-frame counter (scalar int32)
    u: jnp.ndarray            # filled-buffer counter (scalar int32)


def _min_track(buf: jnp.ndarray, sw: jnp.ndarray, u: jnp.ndarray,
               n_u: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Push `sw` into the U-slot buffer and return (new_buf, min over filled)."""
    def push_new(b):
        zero = jnp.zeros((), u.dtype)
        return jax.lax.dynamic_update_slice(b, sw[None, :], (u, zero))

    def push_roll(b):
        b = jnp.roll(b, -1, axis=0)
        return b.at[n_u - 1].set(sw)

    buf = jax.lax.cond(u < n_u, push_new, push_roll, buf)
    count = jnp.minimum(u + 1, n_u)
    valid = jnp.arange(n_u)[:, None] < count
    return buf, jnp.min(jnp.where(valid, buf, jnp.inf), axis=0)


def imcra_init(k: int, dt, cfg: ImcraConfig = ImcraConfig()) -> _State:
    """Fresh IMCRA carry for `imcra_step` (also usable as a streaming state)."""
    return _State(
        s=jnp.zeros(k, dt), ts=jnp.zeros(k, dt),
        smin=jnp.zeros(k, dt), tsmin=jnp.zeros(k, dt),
        smin_sw=jnp.zeros(k, dt), tsmin_sw=jnp.zeros(k, dt),
        store=jnp.zeros((cfg.u_buffers, k), dt),
        tstore=jnp.zeros((cfg.u_buffers, k), dt),
        ov_lam=jnp.zeros(k, dt),
        lam=jnp.full((k,), cfg.lambda_init, dt),
        gain=jnp.ones(k, dt), gamma=jnp.ones(k, dt),
        j=jnp.zeros((), jnp.int32), u=jnp.zeros((), jnp.int32),
    )


def imcra_step(st: _State, y2_l: jnp.ndarray, l: jnp.ndarray,
               cfg: ImcraConfig = ImcraConfig()):
    """One IMCRA frame update: (state, |Y_l|^2 [K], frame index l) ->
    (new state, noise PSD for frame l [K]).  `l` is the absolute frame
    index since stream start (drives the frame-0 init and IS warm-up)."""
    dt = y2_l.dtype
    alpha_s = jnp.asarray(cfg.alpha_s, dt)
    alpha_d = jnp.asarray(cfg.alpha_d, dt)
    is_first = l == 0

    # --- frame-0 initialisation (reference imcra.py:338-361,377-380) ---
    sf0 = _fsmooth(y2_l)
    s = jnp.where(is_first, sf0, st.s)
    ts = jnp.where(is_first, sf0, st.ts)
    smin = jnp.where(is_first, sf0, st.smin)
    tsmin = jnp.where(is_first, sf0, st.tsmin)
    smin_sw = jnp.where(is_first, sf0, st.smin_sw)
    tsmin_sw = jnp.where(is_first, sf0, st.tsmin_sw)
    ov_lam = jnp.where(is_first, y2_l, st.ov_lam)
    lam = jnp.where(is_first, y2_l, st.lam)

    # --- outer decision-directed recursion (imcra.py:541-557) ---
    xi_g = st.gain * st.gain * st.gamma
    gamma = y2_l / jnp.maximum(lam, _TINY)
    xi_ml = jnp.maximum(gamma - 1.0, 1e-6)
    xi = cfg.alpha_dd * xi_g + (1.0 - cfg.alpha_dd) * xi_ml
    xi = jnp.maximum(xi, cfg.xi_min)
    gain = xi / (1.0 + xi)

    # --- shared smoothing (both warm-up and main branch) ---
    sf = _fsmooth(y2_l)
    s = alpha_s * s + (1.0 - alpha_s) * sf
    smin = jnp.minimum(smin, s)
    smin_sw = jnp.minimum(smin_sw, s)

    # --- warm-up branch values (imcra.py:384-398) ---
    lam_warm = alpha_d * lam + (1.0 - alpha_d) * y2_l

    # --- main branch (imcra.py:400-448) ---
    gamma_min = y2_l / jnp.maximum(cfg.bmin * smin, _TINY)
    zeta = s / jnp.maximum(cfg.bmin * smin, _TINY)
    vad_i = ((gamma_min < cfg.gamma0) & (zeta < cfg.zeta0)).astype(dt)

    norm = _fsmooth(vad_i)
    tsf = _fsmooth(vad_i * y2_l)
    tsf = jnp.where(norm > 0, tsf / jnp.maximum(norm, _TINY), tsf)
    ts_main = alpha_s * ts + (1.0 - alpha_s) * tsf
    tsmin_main = jnp.minimum(tsmin, ts_main)
    tsmin_sw_main = jnp.minimum(tsmin_sw, ts_main)

    tgm = y2_l / jnp.maximum(cfg.bmin * tsmin_main, _TINY)
    tz = s / jnp.maximum(cfg.bmin * tsmin_main, _TINY)
    q = jnp.zeros_like(y2_l)
    q = jnp.where((tgm <= 1.0) & (tz < cfg.zeta0), 1.0, q)
    mid = (tgm > 1.0) & (tgm < cfg.gamma1) & (tz < cfg.zeta0)
    q = jnp.where(mid, (cfg.gamma1 - tgm) / (cfg.gamma1 - 1.0), q)

    # a-posteriori speech probability (imcra.py:22-36), capped at p_upthr
    nu = gamma * xi / (1.0 + xi)
    qs = jnp.minimum(q, 1.0 - 1e-7)  # guard the q==1 division; p is
    p = 1.0 / (1.0 + (qs / (1.0 - qs)) * (1.0 + xi) * jnp.exp(-nu))
    p = jnp.where(q < 1.0, p, 0.0)   # forced to 0 where q == 1 anyway
    p = jnp.minimum(p, cfg.p_upthr)

    t_ad = alpha_d + (1.0 - alpha_d) * p
    ov_lam_main = t_ad * ov_lam + (1.0 - t_ad) * y2_l
    lam_main = cfg.beta * ov_lam_main

    # minimum tracking every V-th main frame (imcra.py:450-481)
    j = st.j + 1
    fire = j == cfg.v_frames

    store_new, smin_new = _min_track(st.store, smin_sw, st.u, cfg.u_buffers)
    tstore_new, tsmin_new = _min_track(st.tstore, tsmin_sw_main, st.u,
                                       cfg.u_buffers)
    smin_main = jnp.where(fire, smin_new, smin)
    smin_sw_main = jnp.where(fire, s, smin_sw)
    tsmin_fin = jnp.where(fire, tsmin_new, tsmin_main)
    tsmin_sw_fin = jnp.where(fire, ts_main, tsmin_sw_main)
    store_fin = jnp.where(fire, store_new, st.store)
    tstore_fin = jnp.where(fire, tstore_new, st.tstore)
    j = jnp.where(fire, 0, j)
    u = jnp.where(fire, st.u + 1, st.u)

    # --- select warm-up vs main branch ---
    warm = l < cfg.is_frames
    new = _State(
        s=s,
        ts=jnp.where(warm, ts, ts_main),
        smin=jnp.where(warm, smin, smin_main),
        tsmin=jnp.where(warm, tsmin, tsmin_fin),
        smin_sw=jnp.where(warm, smin_sw, smin_sw_main),
        tsmin_sw=jnp.where(warm, tsmin_sw, tsmin_sw_fin),
        store=jnp.where(warm, st.store, store_fin),
        tstore=jnp.where(warm, st.tstore, tstore_fin),
        ov_lam=jnp.where(warm, ov_lam, ov_lam_main),
        lam=jnp.where(warm, lam_warm, lam_main),
        gain=gain,
        gamma=gamma,
        j=jnp.where(warm, st.j, j),
        u=jnp.where(warm, st.u, u),
    )
    return new, new.lam


@functools.partial(jax.jit, static_argnames=("cfg",))
def imcra_estimate_psd(spec: jnp.ndarray,
                       cfg: ImcraConfig = ImcraConfig()) -> jnp.ndarray:
    """Estimate the noise PSD of a (noisy) complex spectrogram.

    Args:
      spec: complex STFT ``[K, T]`` (bins-first, as produced by dsp.stft).
    Returns:
      noise PSD ``[K, T]`` (same layout), matching the reference
      `imcra_est.estimate` / `NoisePSD` (audio_util.py:113-117).
    """
    y2 = (spec.real * spec.real + spec.imag * spec.imag).T  # [T, K] powers
    y2 = y2.astype(jnp.result_type(y2.dtype, jnp.float32))
    k = y2.shape[-1]
    dt = y2.dtype

    def step(st, inp):
        y2_l, l = inp
        return imcra_step(st, y2_l, l, cfg)

    t = y2.shape[0]
    _, psd = jax.lax.scan(step, imcra_init(k, dt, cfg), (y2, jnp.arange(t)))
    return psd.T  # back to [K, T]
