"""ITU-T P.862 (PESQ) perceptual model in JAX — full-structure, on-device.

The reference scores quality with the pypesq C extension
(reference: intel.py:9,142-160), i.e. the ITU-T P.862 reference code run at
16 kHz (wideband P.862.2 mode).  That engine cannot be vendored here, so this
module re-implements the *complete P.862 perceptual + cognitive model* from
the standard, stage by stage, as one jittable / vmappable / differentiable
JAX program:

  1.  level alignment — both signals scaled to TARGET_POWER = 1e7 internal
      power in the 350-3250 Hz band (P.862 `fix_power_level`);
  2.  wideband input filter — P.862.2's ~100 Hz high-pass, applied here in
      the frequency domain (folded into the per-frame power spectra; the
      perceptual model only ever consumes |FFT|^2, so this is equivalent to
      the time-domain IIR up to frame-boundary leakage);
  3.  32 ms Hann frames, 50 % overlap, power spectra;
  4.  Bark warping to 49 bands ("pitch power densities", scale Sp);
  5.  partial frequency-response compensation of the REFERENCE toward the
      degraded signal's average spectrum (ratio clipped to [0.01, 100]) —
      this is what keeps P.862 from punishing linear EQ, and it matters for
      NELE enhancement, which applies per-band gains by design;
  6.  short-term gain compensation of the DEGRADED signal (per-frame audible
      power ratio, clipped to [3e-4, 5], first-order smoothed 0.2/0.8);
  7.  Zwicker loudness (exponent 0.23, low-band modification
      min(6/(z+2), 2)^0.15, scale Sl);
  8.  disturbance = loudness difference with a 0.25*min masking deadzone;
      asymmetric disturbance via ((deg+50)/(ref+50))^1.2 in [3, 12];
  9.  frame pooling: band-width-weighted Lp over Bark bands (p=2 symmetric /
      p=1 asymmetric), frame weight ((P_ref+1e5)/1e7)^0.04, clip at 45;
  10. time pooling: L6 over 20-frame "syllable" windows (50 % overlap), then
      L2 over windows;
  11. raw PESQ = 4.5 - 0.1*d_sym - 0.0309*d_asym, and the P.862.2 wideband
      MOS-LQO map 0.999 + 4/(1 + exp(-1.3669 x + 3.8224)).

Documented deviations from the ITU reference code (none of which the
framework's training semantics depend on — the quality discriminator only
consumes calibrated scores, reference dataloader.py:75, train_nele.py:152):

  * the Bark band layout, band widths, and absolute hearing thresholds are
    re-derived from the published formulas (Zwicker Hz->Bark map; Terhardt
    threshold curve anchored at 79.8 dB SPL == internal power 1e7) instead
    of copying the ITU tables;
  * time alignment is optional and OFF for training: in this framework
    enhanced audio is synthesized frame-synchronously from the clean
    signal's own STFT, so the true delay is exactly zero.  For eval-grade
    use on external (delayed / jittery) pairs, `align_global` searches a
    single global delay, `align_utterances` adds P.862-style utterance
    splitting with a per-utterance delay (static MAX_UTTS slots, envelope
    cross-correlation, one sample-gather rebuild — `_utterance_align`),
    and `align_bad_intervals` adds the P.862 "bad interval" re-alignment
    (ITU source dsp.c, re-derived): frames whose pooled disturbance
    exceeds 30 are grouped into runs of >= 5, each run gets a fresh
    waveform cross-correlation delay search, its frames' disturbances are
    recomputed at the new delay (reusing the stored gain compensation, as
    the ITU code does), and the smaller value wins per frame — this is
    what absorbs delay CHANGES inside one utterance;
  * silence/activity decisions use the same internal-power constants as the
    ITU code (1e4 audible-power floor) but no per-utterance splitting.

Everything is static-shape (padded batches with `n_valid` masks), so a whole
validation corpus scores as one vmapped XLA program — replacing the
reference's 32-process CPU pool (audio_util.py:205-228) with MXU matmuls and
batched FFTs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nelegan_tpu.dsp.stft import frame_signal, hann_periodic

FS = 16000
N_FFT = 512          # 32 ms at 16 kHz (P.862 Nf for 16k mode)
HOP = 256            # 50 % overlap
N_BARK = 49          # P.862 16 kHz band count
SP_16K = 6.910853e-6     # P.862 power scale Sp (16 kHz mode)
SL_16K = 1.866055e-1     # P.862 loudness scale Sl (16 kHz mode)
TARGET_POWER = 1e7
ZWICKER_POWER = 0.23
D_WEIGHT, A_WEIGHT = 0.1, 0.0309
SYLLABLE = 20        # frames per "split second" pooling window
_EPS = 1e-12


def _hz_to_bark(f: np.ndarray) -> np.ndarray:
    """Zwicker/Terhardt critical-band rate (the P.862 warping curve family)."""
    f = np.asarray(f, np.float64)
    return 13.0 * np.arctan(0.00076 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)


@functools.lru_cache(maxsize=None)
def _bark_tables():
    """(assignment matrix [49, 257], band widths in Bark [49],
    centre-of-band Bark [49], absolute threshold internal power [49],
    WB input-filter power gain [257]).

    Each rfft bin is assigned to exactly one of 49 uniform-width Bark bands
    spanning 0..bark(8000); band "pitch power density" is the Sp-scaled sum
    of its bins (the ITU code's nr_of_hz_bands_per_bark_band /
    pow_dens_correction_factor scheme, re-derived).
    """
    n_bins = N_FFT // 2 + 1
    f = np.arange(n_bins) * (FS / N_FFT)
    zmax = _hz_to_bark(np.array([FS / 2.0]))[0]
    width = zmax / N_BARK
    z = _hz_to_bark(f)
    band = np.minimum((z / width).astype(np.int64), N_BARK - 1)
    m = np.zeros((N_BARK, n_bins), np.float64)
    m[band, np.arange(n_bins)] = 1.0
    widths = np.full(N_BARK, width)
    centres = (np.arange(N_BARK) + 0.5) * width

    # centre frequency of each band in Hz (inverse bark by interpolation)
    fg = np.linspace(0, FS / 2, 4097)
    centre_hz = np.interp(centres, _hz_to_bark(fg), fg)
    # Terhardt absolute threshold (dB SPL); internal calibration: a frame of
    # band-limited speech at the aligned level has total pitch power ~1e7,
    # which P.862 equates with 79.8 dB SPL presentation.
    fk = np.maximum(centre_hz, 20.0) / 1000.0
    thr_db = (3.64 * fk ** -0.8
              - 6.5 * np.exp(-0.6 * (fk - 3.3) ** 2)
              + 1e-3 * fk ** 4)
    abs_thresh = 10.0 ** ((np.clip(thr_db, -10.0, 90.0) - 9.8) / 10.0)

    # P.862.2 wideband input filter: high-pass, -3 dB near 100 Hz
    # (4th-order Butterworth magnitude response, applied on the bin grid).
    fc = 100.0
    hp_gain = 1.0 / (1.0 + (fc / np.maximum(f, 1e-3)) ** 8)
    hp_gain[0] = 0.0
    return m, widths, centres, abs_thresh, hp_gain


@functools.lru_cache(maxsize=None)
def _zwicker_exponents() -> np.ndarray:
    """Per-band modified Zwicker exponent (low bands get a boosted power)."""
    _, _, centres, _, _ = _bark_tables()
    h = np.where(centres < 4.0, np.minimum(6.0 / (centres + 2.0), 2.0), 1.0)
    return ZWICKER_POWER * h ** 0.15


def _band_limited_msq(x: jnp.ndarray, n_valid, lo_hz=350.0, hi_hz=3250.0):
    """Mean-square power of x restricted to [lo, hi] Hz (P.862 level band)."""
    n = x.shape[-1]
    spec = jnp.fft.rfft(x)
    f = np.arange(n // 2 + 1) * (FS / n)
    sel = jnp.asarray(((f >= lo_hz) & (f <= hi_hz)).astype(np.float32),
                      x.dtype)
    nv = (jnp.asarray(n, x.dtype) if n_valid is None
          else n_valid.astype(x.dtype))
    # Parseval: mean-square = 2/N^2 * sum |X_k|^2 over positive bins
    return 2.0 / (n * nv) * jnp.sum(jnp.abs(spec) ** 2 * sel)


def _safe_root(s: jnp.ndarray, q: float) -> jnp.ndarray:
    """s ** q with finite gradient at s == 0 (value-exact).

    Fractional powers have d/ds = inf at 0, and silent/padded frames have
    exactly-zero pooled disturbance — a bare root would emit NaN gradients
    through the whole graph (this model doubles as a training loss, see
    train/direct.py pesq_weight).  The double-where evaluates the power
    only on the positive branch, so both value and gradient are clean."""
    pos = s > 0
    safe = jnp.where(pos, s, 1.0)
    return jnp.where(pos, safe ** q, 0.0)


def _pseudo_lp(d: jnp.ndarray, widths: jnp.ndarray, p: float) -> jnp.ndarray:
    """Band-width-weighted Lp pooling over Bark bands (P.862 pseudo_Lp):
    ( sum_b (|d_b| * w_b)^p / sum_b w_b )^(1/p) * sum_b w_b.  d: [T, 49]."""
    total_w = jnp.sum(widths)
    s = jnp.sum((jnp.abs(d) * widths) ** p, axis=-1) / total_w
    return _safe_root(s, 1.0 / p) * total_w


def _lpq_weight(frame_d: jnp.ndarray, frame_w: jnp.ndarray,
                p_syl: float = 6.0, p_time: float = 2.0) -> jnp.ndarray:
    """P.862 Lpq time pooling: Lp over 20-frame windows stepping 10 (50 %
    overlap), then Lq over windows.  `frame_w` in [0,1] marks valid frames;
    fully-invalid windows carry zero weight."""
    t = frame_d.shape[-1]
    step = SYLLABLE // 2
    n_win = max(1, -(-t // step))
    pad = n_win * step + SYLLABLE - t
    d = jnp.pad(frame_d, (0, pad))
    w = jnp.pad(frame_w, (0, pad))
    idx = (np.arange(n_win)[:, None] * step + np.arange(SYLLABLE)[None, :])
    dw, ww = d[idx], w[idx]                       # [n_win, 20]
    cnt = jnp.sum(ww, axis=-1)
    syl = _safe_root(jnp.sum((dw * ww) ** p_syl, axis=-1)
                     / jnp.maximum(cnt, 1.0), 1.0 / p_syl)
    win_w = jnp.minimum(cnt, 1.0)
    total = jnp.sum((syl * win_w) ** p_time) / jnp.maximum(
        jnp.sum(win_w), 1.0)
    return _safe_root(total, 1.0 / p_time)


def _smooth_gain(h: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """First-order smoothing g_t = 0.2 g_{t-1} + 0.8 h_t (P.862 short-term
    gain memory) as an associative scan — parallel depth log T, not T."""
    h = jnp.where(valid > 0, h, 1.0)
    a = jnp.full_like(h, 0.2)
    b = 0.8 * h

    def combine(x, y):
        (ax, bx), (ay, by) = x, y
        return ax * ay, ay * bx + by

    _, g = jax.lax.associative_scan(combine, (a, b))
    # initial condition g_{-1} = 1: the scan above assumes g_{-1} = 0, so
    # add the homogeneous term prod(a) * 1 = 0.2^(t+1)
    t = h.shape[-1]
    g = g + 0.2 ** jnp.arange(1, t + 1, dtype=h.dtype)
    return g


@functools.partial(jax.jit, static_argnames=("align_global",
                                             "align_utterances",
                                             "align_bad_intervals"))
def pesq_p862_16k(ref: jnp.ndarray, deg: jnp.ndarray,
                  n_valid: jnp.ndarray | None = None,
                  align_global: bool = False,
                  align_utterances: bool = False,
                  align_bad_intervals: bool = False) -> jnp.ndarray:
    """Raw P.862 PESQ score (≈ [-0.5, 4.5]) for 16 kHz signals.

    Args:
      ref / deg: equal-length 1-D signals (zero-padded beyond `n_valid`).
      n_valid:   optional valid-sample count for padded/bucketed batches.
      align_global: search a single global delay (±128 ms) by envelope
        cross-correlation before scoring.  Unnecessary (and off) for this
        framework's frame-synchronous enhancement outputs.
      align_utterances: P.862 utterance splitting + per-utterance delay
        (implies the global search first, as the ITU flow does).  For
        eval-grade scoring of pairs whose delay JUMPS between utterances
        (e.g. VoIP traces); never needed for this framework's outputs.
      align_bad_intervals: P.862 bad-interval re-alignment (implies both
        stages above, matching the ITU flow): after the perceptual model
        runs, high-disturbance frame runs get a fresh per-interval delay
        search and their disturbances are recomputed at the better delay.
        Absorbs delay changes INSIDE an utterance, which the stages above
        cannot fix.  Eval-grade only.
    """
    dt = ref.dtype
    n = ref.shape[-1]
    if n_valid is not None:
        smask = (jnp.arange(n) < n_valid).astype(dt)
        ref = ref * smask
        deg = deg * smask

    if align_global or align_utterances or align_bad_intervals:
        deg = _global_align(ref, deg)
    if align_utterances or align_bad_intervals:
        deg = _utterance_align(ref, deg)

    # --- 1. level alignment -------------------------------------------------
    ref = ref * jnp.sqrt(TARGET_POWER / jnp.maximum(
        _band_limited_msq(ref, n_valid), _EPS))
    deg = deg * jnp.sqrt(TARGET_POWER / jnp.maximum(
        _band_limited_msq(deg, n_valid), _EPS))

    # --- 3./2. frames -> power spectra, WB high-pass folded in --------------
    bark_m, widths_np, _, thresh_np, hp_np = _bark_tables()
    win = jnp.asarray(hann_periodic(N_FFT), dt)
    fr = frame_signal(ref, N_FFT, HOP, center=False) * win   # [T, 512]
    fd = frame_signal(deg, N_FFT, HOP, center=False) * win
    hp = jnp.asarray(hp_np, dt)
    pr = jnp.abs(jnp.fft.rfft(fr, axis=-1)) ** 2 * hp        # [T, 257]
    pd = jnp.abs(jnp.fft.rfft(fd, axis=-1)) ** 2 * hp
    t_frames = pr.shape[0]
    if n_valid is None:
        fmask = jnp.ones((t_frames,), dt)
    else:
        t_valid = jnp.maximum((n_valid - N_FFT) // HOP + 1, 1)
        fmask = (jnp.arange(t_frames) < t_valid).astype(dt)

    # --- 4. Bark pitch power densities --------------------------------------
    bark = jnp.asarray(bark_m, dt)
    widths = jnp.asarray(widths_np, dt)
    thresh = jnp.asarray(thresh_np, dt)
    ppr = SP_16K * (pr @ bark.T)                              # [T, 49]
    ppd = SP_16K * (pd @ bark.T)

    audible = lambda p: jnp.sum(jnp.where(p > thresh, p, 0.0), axis=-1)
    aud_ref = audible(ppr) * fmask
    aud_deg = audible(ppd) * fmask

    # --- 5. partial frequency-response compensation (of the reference) ------
    active = (aud_ref > 1e4).astype(dt) * fmask
    n_act = jnp.maximum(jnp.sum(active), 1.0)
    avg_r = jnp.sum(ppr * active[:, None], axis=0) / n_act
    avg_d = jnp.sum(ppd * active[:, None], axis=0) / n_act
    freq_comp = jnp.clip((avg_d + 1000.0) / (avg_r + 1000.0), 0.01, 100.0)
    ppr = ppr * freq_comp[None, :]
    aud_ref_c = audible(ppr) * fmask

    # --- 6. short-term gain compensation (of the degraded) ------------------
    h = jnp.clip((aud_ref_c + 5e3) / (aud_deg + 5e3), 3e-4, 5.0)
    gain = _smooth_gain(h, fmask)
    ppd = ppd * gain[:, None]

    # --- 7. Zwicker loudness -------------------------------------------------
    zw = jnp.asarray(_zwicker_exponents(), dt)

    def loudness(p):
        s = ((thresh / 0.5) ** zw
             * ((0.5 + 0.5 * p / thresh) ** zw - 1.0))
        return SL_16K * jnp.maximum(s, 0.0)

    lr = loudness(ppr)
    fw = ((aud_ref + 1e5) / 1e7) ** 0.04

    def frames_disturbance(ppd_g):
        """Stages 8-9 (disturbance, asymmetry, frame pooling) from a
        gain-compensated degraded pitch-power density [T, 49].  Closure so
        the bad-interval re-alignment can recompute shifted frames against
        the SAME compensated reference loudness / frame weights."""
        ld = loudness(ppd_g)
        d = ld - lr
        dead = 0.25 * jnp.minimum(lr, ld)
        d_sym = jnp.sign(d) * jnp.maximum(jnp.abs(d) - dead, 0.0)
        asym = ((ppd_g + 50.0) / (ppr + 50.0)) ** 1.2
        asym = jnp.where(asym < 3.0, 0.0, jnp.minimum(asym, 12.0))
        d_asym = d_sym * asym
        f_sym = jnp.minimum(_pseudo_lp(d_sym, widths, 2.0) / fw,
                            45.0) * fmask
        f_asym = jnp.minimum(_pseudo_lp(d_asym, widths, 1.0) / fw,
                             45.0) * fmask
        return f_sym, f_asym

    # --- 8./9. disturbance + asymmetry + frame pooling -----------------------
    frame_sym, frame_asym = frames_disturbance(ppd)

    if align_bad_intervals:
        frame_sym, frame_asym = _bad_interval_realign(
            ref, deg, frame_sym, frame_asym, fmask, gain,
            frames_disturbance, win, hp, bark)

    # --- 10./11. time pooling -> raw PESQ -------------------------------------
    d_ind = _lpq_weight(frame_sym, fmask)
    a_ind = _lpq_weight(frame_asym, fmask)
    return 4.5 - D_WEIGHT * d_ind - A_WEIGHT * a_ind


def _global_align(ref: jnp.ndarray, deg: jnp.ndarray) -> jnp.ndarray:
    """Single global delay estimate (P.862 crude alignment, 4 ms envelope
    cross-correlation) applied as a roll of the degraded signal."""
    blk = 64  # 4 ms at 16 kHz
    n = ref.shape[-1] // blk * blk
    er = jnp.log1p(jnp.sum(ref[:n].reshape(-1, blk) ** 2, axis=-1))
    ed = jnp.log1p(jnp.sum(deg[:n].reshape(-1, blk) ** 2, axis=-1))
    er = er - jnp.mean(er)
    ed = ed - jnp.mean(ed)
    m = er.shape[0]
    fr = jnp.fft.rfft(er, n=2 * m)
    fd = jnp.fft.rfft(ed, n=2 * m)
    xc = jnp.fft.irfft(fr * jnp.conj(fd), n=2 * m)
    max_lag = min(m - 1, (FS // blk) * 128 // 1000)  # ±128 ms
    lags = jnp.concatenate([jnp.arange(max_lag + 1),
                            jnp.arange(-max_lag, 0)])
    vals = jnp.concatenate([xc[:max_lag + 1], xc[-max_lag:]])
    delay_blocks = lags[jnp.argmax(vals)]
    return jnp.roll(deg, delay_blocks * blk)


MAX_UTTS = 8         # static utterance slots for per-utterance alignment
UTT_GAP_MS = 200.0   # silence gap that splits utterances (P.862 pesqpar.h
#                      joins utterances closer than ~200 ms of silence)
MIN_PIECE_BLOCKS = 25    # min voting blocks per split piece (~100 ms, the
#                          ITU's minimum utterance-piece length); also the
#                          vote margin a split must gain to be accepted
SPLIT_WIN_BLOCKS = 40    # ±window (160 ms) for the local-delay vote
SPLIT_CONF = 0.5         # min normalised local correlation to cast a vote


def _utterance_align(ref: jnp.ndarray, deg: jnp.ndarray) -> jnp.ndarray:
    """P.862-style utterance splitting + per-utterance delay, static shape.

    The ITU flow (source pesqmain.c: utterance identification on the
    reference's VAD, then crude+fine per-utterance alignment) re-expressed
    for XLA: 4 ms block energies -> a 25 dB-below-peak VAD -> utterance
    starts where activity resumes after >= UTT_GAP_MS of silence (a
    rolling-max over the gap window, no dynamic segment lists) -> one
    split-aware envelope correlation per static utterance slot (ITU
    split_align: each slot may break into two pieces with independent
    delays when the delay jumps mid-utterance — see slot_split) -> one
    waveform-resolution refinement per piece -> the degraded signal
    rebuilt with ONE sample gather, each sample shifted by its piece's
    delay.  Residual gross misalignments are handled downstream by
    `_bad_interval_realign`."""
    dt = ref.dtype
    blk = 64  # 4 ms at 16 kHz
    n = ref.shape[-1] // blk * blk
    m = n // blk
    if m == 0:  # shorter than one 4 ms block: nothing to align (static
        return deg  # shape, so a host-level early return is trace-safe)
    er = jnp.sum(ref[:n].reshape(m, blk) ** 2, axis=-1)       # [M]
    ed = jnp.sum(deg[:n].reshape(m, blk) ** 2, axis=-1)
    er_db = 10.0 * jnp.log10(er + _EPS)
    active = (er_db > jnp.max(er_db) - 25.0)

    # utterance starts: active block with NO activity in the previous GAP
    # blocks.  Rolling any-of-GAP via cumsum difference (exclusive).
    gap = int(UTT_GAP_MS * FS / 1000 / blk)
    csum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(active.astype(jnp.int32))])
    prev_any = (csum[:-1] - csum[jnp.maximum(
        jnp.arange(m) - gap, 0)]) > 0                         # [M]
    starts = active & ~prev_any
    # block -> utterance id (capped at MAX_UTTS-1).  cumsum gives the id
    # of the most recent START; silence between utterances must instead
    # split at the MIDPOINT of the gap (P.862's utterance windows are
    # generous): a quiet onset just below the VAD threshold belongs to
    # the upcoming utterance, not the previous one — otherwise those
    # samples keep the previous delay and score as disturbance.
    uid = jnp.clip(jnp.cumsum(starts.astype(jnp.int32)) - 1,
                   0, MAX_UTTS - 1)                           # [M]
    ar = jnp.arange(m)
    prev_act = jax.lax.cummax(jnp.where(active, ar, -1))      # [M]
    next_act = m - 1 - jax.lax.cummax(
        jnp.where(active[::-1], ar, -1))[::-1]
    has_next = jax.lax.cummax(
        jnp.where(active[::-1], 1, 0))[::-1].astype(bool)
    use_next = has_next & ((prev_act < 0)
                           | (next_act - ar < ar - prev_act))
    uid = jnp.where(use_next, uid[jnp.clip(next_act, 0, m - 1)], uid)

    # per-slot SPLIT-AWARE delay (P.862 split_align, re-derived): a delay
    # that CHANGES inside one utterance cannot be fit by a single lag, so
    # each slot also tests splitting into two pieces with independent
    # delays.  All prefix cross-correlations come from ONE cumulative sum:
    # with M[t, l] = e[t] * d[t - l], prefix[s, l] = sum_{t<s} M[t, l] is
    # the left-piece correlation for every candidate split s at once —
    # O(m * lags) total, no extra FFTs.  The split is accepted only when
    # the two pieces pick DIFFERENT lags and their combined correlation
    # beats the unsplit peak by a margin (spurious splits on synchronous
    # content fail one of the two gates).
    le = jnp.log1p(er)
    ld_ = jnp.log1p(ed)
    ld_ = ld_ - jnp.mean(ld_)
    max_lag = min(m - 1, (FS // blk) * 128 // 1000)           # ±128 ms
    lags_b = jnp.arange(-max_lag, max_lag + 1)                # [L]
    src_b = jnp.arange(m)[:, None] - lags_b[None, :]          # [m, L]
    dmat = jnp.where((src_b >= 0) & (src_b < m),
                     ld_[jnp.clip(src_b, 0, m - 1)], 0.0)     # [m, L]

    # local delay VOTES for the split decision: each block correlates a
    # ±SPLIT_WIN_BLOCKS window of the reference envelope against the
    # degraded at every lag (normalised), and votes for its best lag when
    # confident.  Synchronous content votes one lag almost everywhere, so
    # a split can never explain MIN_PIECE_BLOCKS more votes than the
    # single best lag — while a genuine mid-utterance jump moves a whole
    # contiguous population of votes to a second lag.
    le_c = le - jnp.mean(le)

    def _boxsum(x):
        """Window sum over t with radius SPLIT_WIN_BLOCKS (any trailing
        dims), via padded cumsum."""
        w = SPLIT_WIN_BLOCKS
        cs = jnp.cumsum(x, axis=0)
        z = jnp.zeros_like(cs[:1])
        cs = jnp.concatenate([z, cs])                         # [m+1, ...]
        hi = jnp.minimum(jnp.arange(m) + w + 1, m)
        lo = jnp.maximum(jnp.arange(m) - w, 0)
        return cs[hi] - cs[lo]

    c_loc = _boxsum(le_c[:, None] * dmat)                     # [m, L]
    e_loc = _boxsum(le_c ** 2)                                # [m]
    b_loc = _boxsum(ld_ ** 2)                                 # [m]
    bl_idx = jnp.clip(src_b, 0, m - 1)
    bl = b_loc[bl_idx]                                        # [m, L]
    nc = c_loc / (jnp.sqrt(e_loc[:, None] * bl) + _EPS)
    local_lag = jnp.argmax(nc, axis=1)                        # [m] lag idx
    conf = jnp.max(nc, axis=1)                                # [m]
    votes = (jax.nn.one_hot(local_lag, lags_b.shape[0])
             * (active & (conf > SPLIT_CONF))[:, None])       # [m, L]

    def slot_split(u):
        # slot EXTENT (not VAD-active) mask for the coarse correlation:
        # with the mean removed over active blocks only, content whose
        # active blocks all carry similar energy left a near-zero masked
        # envelope and an arbitrary coarse lag (an identical pair of
        # repeating bursts measured d0 = 19 blocks and scored 1.08
        # instead of 4.5 — r4 ADVICE #2).  Keeping the gap blocks'
        # (negative, mean-removed) envelope inside the correlation gives
        # synchronous content a dominant peak at lag 0.
        msk = (uid == u)
        cnt = jnp.maximum(jnp.sum(msk), 1)
        # raw slot correlation: the single-delay (unsplit) coarse estimate,
        # as before the split stage existed
        e = jnp.where(msk, le - jnp.sum(le * msk) / cnt, 0.0)
        total_x = jnp.sum(e[:, None] * dmat, axis=0)          # [L]
        d0 = lags_b[jnp.argmax(total_x)]
        # vote accounting for the split decision
        v = votes * (uid == u)[:, None]                       # [m, L]
        pre = jnp.concatenate([jnp.zeros((1, v.shape[1]), v.dtype),
                               jnp.cumsum(v, axis=0)])        # [m+1, L]
        total_v = pre[-1]
        suf = total_v[None, :] - pre
        explained = jnp.max(pre, axis=1) + jnp.max(suf, axis=1)
        c = jnp.concatenate([jnp.zeros((1,)),
                             jnp.cumsum(jnp.sum(v, axis=1))])
        ok = ((c >= MIN_PIECE_BLOCKS)
              & (c[-1] - c >= MIN_PIECE_BLOCKS))              # [m+1]
        score = jnp.where(ok, explained, -jnp.inf)
        s_star = jnp.argmax(score)
        unsplit_v = jnp.max(total_v)
        d_l = lags_b[jnp.argmax(pre[s_star])]
        d_r = lags_b[jnp.argmax(suf[s_star])]
        do_split = (jnp.any(ok)
                    & (score[s_star] >= unsplit_v + MIN_PIECE_BLOCKS)
                    & (d_l != d_r))
        split_at = jnp.where(do_split, s_star, m)
        return (split_at,
                jnp.where(do_split, d_l, d0),
                jnp.where(do_split, d_r, d0))

    split_at, d_left, d_right = jax.vmap(slot_split)(
        jnp.arange(MAX_UTTS))                                 # [U] each

    # sample-level spectra for the fine refinement (one rfft of deg,
    # one per PIECE of the masked ref)
    nfull = ref.shape[-1]
    fd_s = jnp.fft.rfft(deg, n=2 * nfull)

    def piece_fine(u, side):
        """P.862's sample-resolution stage: waveform cross-correlation in
        a ±1-block window around the piece's coarse envelope estimate —
        a pure delay peaks exactly there."""
        in_side = jnp.where(side == 0, ar < split_at[u], ar >= split_at[u])
        pm = (uid == u) & active & in_side
        coarse = jnp.where(side == 0, d_left[u], d_right[u]) * blk
        msk_s = jnp.repeat(pm, blk, total_repeat_length=n)
        msk_s = jnp.pad(msk_s, (0, nfull - n))
        r_m = jnp.where(msk_s, ref, 0.0)
        xs = jnp.fft.irfft(jnp.fft.rfft(r_m, n=2 * nfull)
                           * jnp.conj(fd_s), n=2 * nfull)
        win = jnp.roll(xs, blk - coarse)[:2 * blk + 1]
        d = coarse + jnp.argmax(win) - blk
        return jnp.where(jnp.any(pm), d, 0)

    us = jnp.repeat(jnp.arange(MAX_UTTS), 2)
    sides = jnp.tile(jnp.arange(2), MAX_UTTS)
    delays = jax.vmap(piece_fine)(us, sides).reshape(
        MAX_UTTS, 2)                                          # samples

    # rebuild: sample i of the aligned degraded comes from
    # deg[i - delay(piece(i))] (delay>0 means deg lags ref)
    side_b = (ar >= split_at[uid]).astype(jnp.int32)          # [M]
    shift_b = delays[uid, side_b]                             # [M] samples
    shift = jnp.repeat(shift_b, blk, total_repeat_length=n)
    if ref.shape[-1] > n:  # ragged tail keeps the last piece's delay
        shift = jnp.concatenate(
            [shift, jnp.full((ref.shape[-1] - n,),
                             shift_b[-1] if m else 0, shift.dtype)])
    idx = jnp.clip(jnp.arange(ref.shape[-1]) - shift, 0,
                   ref.shape[-1] - 1)
    gathered = deg[idx]
    # out-of-range sources are silence, not edge clamps
    valid = ((jnp.arange(ref.shape[-1]) - shift >= 0)
             & (jnp.arange(ref.shape[-1]) - shift < ref.shape[-1]))
    return jnp.where(valid, gathered, jnp.zeros((), dt))


BAD_FRAME_THRESHOLD = 30.0   # P.862 threshold_for_bad_frames
SMEAR_RANGE = 2              # P.862 bad-frame smear radius (gap closing)
MIN_BAD_FRAMES = 5           # minimum run length that forms a bad interval
MAX_BAD_INTERVALS = 8        # static re-alignment slots; later runs keep
#                              their original (conservative) disturbance
MAX_DELTA = 2048             # ±128 ms per-interval delay search window
CORR_GATE = 0.5              # unreliable searches keep the original frames


def _bad_interval_realign(ref, deg, frame_sym, frame_asym, fmask, gain,
                          frames_disturbance, win, hp, bark):
    """P.862 bad-interval re-alignment (ITU source dsp.c flow, re-derived
    from the standard's description — reference consumer: intel.py:146).

    The ITU flow: frames whose pooled disturbance exceeds 30 are grouped
    into runs; runs of >= 5 frames form "bad intervals"; each interval gets
    a fresh delay search (waveform cross-correlation of the interval's
    reference samples against the degraded signal); the interval's frames
    are re-windowed at the new delay, pushed through the SAME loudness /
    disturbance stages (reusing the stored short-term gain, as the ITU
    code reuses its gain memory), and the smaller per-frame disturbance
    wins.  Unreliable searches (normalised correlation < 0.5) keep the
    original frames.  Expressed for XLA with static shapes: run-ids by
    cumsum over run starts, MAX_BAD_INTERVALS vmapped masked-FFT delay
    searches, and ONE re-framed gather + spectra pass for all frames
    (shift 0 outside bad intervals)."""
    t_frames = frame_sym.shape[0]
    n = ref.shape[-1]
    bad = (frame_sym > BAD_FRAME_THRESHOLD) & (fmask > 0)
    # ITU smear: a frame is (or stays) bad iff a bad frame lies within
    # SMEAR_RANGE on its left AND within SMEAR_RANGE on its right — a
    # morphological closing that joins runs separated by <= 2 good frames
    # without growing isolated edges.
    badf = bad.astype(jnp.float32)
    k = np.ones(SMEAR_RANGE + 1, np.float32)
    left = jnp.convolve(jnp.concatenate(
        [jnp.zeros((SMEAR_RANGE,), jnp.float32), badf]), k,
        mode="valid") > 0
    right = jnp.convolve(jnp.concatenate(
        [badf, jnp.zeros((SMEAR_RANGE,), jnp.float32)]), k,
        mode="valid") > 0
    bad = left & right & (fmask > 0)
    prev = jnp.concatenate([jnp.zeros((1,), bool), bad[:-1]])
    starts = bad & ~prev
    rid = jnp.where(bad, jnp.cumsum(starts.astype(jnp.int32)) - 1, -1)

    fd_s = jnp.fft.rfft(deg, n=2 * n)
    max_delta = min(MAX_DELTA, n - 1)
    ar_n = jnp.arange(n)
    idx_f = jnp.arange(t_frames)
    # cumulative degraded energy for the SHIFTED-window gate below
    ce_d = jnp.concatenate([jnp.zeros((1,), deg.dtype),
                            jnp.cumsum(deg * deg)])

    def slot_delta(u):
        fm = rid == u                                        # [T]
        qual = jnp.sum(fm) >= MIN_BAD_FRAMES
        start = jnp.min(jnp.where(fm, idx_f, t_frames))
        stop = jnp.max(jnp.where(fm, idx_f, -1))
        # samples the run's frames cover (frame t: [t*HOP, t*HOP + N_FFT))
        msk_s = (ar_n >= start * HOP) & (ar_n < stop * HOP + N_FFT)
        r_m = jnp.where(msk_s, ref, 0.0)
        xs = jnp.fft.irfft(jnp.fft.rfft(r_m, n=2 * n) * jnp.conj(fd_s),
                           n=2 * n)
        vals = jnp.concatenate([xs[:max_delta + 1], xs[-max_delta:]])
        lags = jnp.concatenate([jnp.arange(max_delta + 1),
                                jnp.arange(-max_delta, 0)])
        best = jnp.argmax(vals)
        # reliability: peak normalised by the interval energies (the ITU
        # code's "best correlation" gate).  The degraded energy comes
        # from the window SHIFTED by the candidate lag — the same samples
        # the peak actually correlates — so corr is Cauchy-Schwarz-bounded
        # by 1.  Normalising by the unshifted window (r4) let a
        # near-silent dropout window produce corr > 1 and re-align onto a
        # neighboring identical copy, hiding its disturbance (ADVICE #1).
        e_r = jnp.sum(r_m ** 2)
        lo = jnp.clip(start * HOP - lags, 0, n)
        hi = jnp.clip(stop * HOP + N_FFT - lags, 0, n)
        e_d = (ce_d[hi] - ce_d[lo])[best]
        corr = vals[best] / jnp.sqrt(jnp.maximum(e_r * e_d, _EPS))
        ok = qual & (corr > CORR_GATE)
        return jnp.where(ok, lags[best], 0)

    deltas = jax.vmap(slot_delta)(jnp.arange(MAX_BAD_INTERVALS))
    in_slot = (rid >= 0) & (rid < MAX_BAD_INTERVALS)
    shift = jnp.where(in_slot,
                      deltas[jnp.clip(rid, 0, MAX_BAD_INTERVALS - 1)], 0)

    # re-windowed degraded frames at the per-frame shift:
    # aligned sample i comes from deg[i - delta] (delay > 0: deg lags ref)
    base = (np.arange(t_frames)[:, None] * HOP
            + np.arange(N_FFT)[None, :])                     # [T, 512]
    src = base - shift[:, None]
    valid = (src >= 0) & (src < n)
    fdg = jnp.where(valid, deg[jnp.clip(src, 0, n - 1)], 0.0) * win
    pd2 = jnp.abs(jnp.fft.rfft(fdg, axis=-1)) ** 2 * hp
    ppd2 = SP_16K * (pd2 @ bark.T) * gain[:, None]
    sym2, asym2 = frames_disturbance(ppd2)

    replace = (shift != 0) & (sym2 < frame_sym)
    return (jnp.where(replace, sym2, frame_sym),
            jnp.where(replace, asym2, frame_asym))


def mos_lqo_wb(raw_pesq: jnp.ndarray) -> jnp.ndarray:
    """P.862.2 wideband raw-score -> MOS-LQO mapping."""
    return 0.999 + 4.0 / (1.0 + jnp.exp(-1.3669 * raw_pesq + 3.8224))


def pesq_p862(ref, deg, fs: int = 16000, align_global: bool = False,
              align_utterances: bool = False,
              align_bad_intervals: bool = False):
    """Host-friendly wrapper: trims to equal length, returns raw PESQ."""
    assert fs == FS, "pesq_p862 expects 16 kHz input"
    n = min(ref.shape[-1], deg.shape[-1])
    return pesq_p862_16k(jnp.asarray(ref)[..., :n],
                         jnp.asarray(deg)[..., :n],
                         align_global=align_global,
                         align_utterances=align_utterances,
                         align_bad_intervals=align_bad_intervals)
