"""Post-ear-model metric chains for HASPI v1/v2 and HASQI v2.

JAX re-architecture of the reference's envelope/modulation analysis
(reference: pyHASPI/pyhaspi2.py:161-751).  Everything is fixed-shape and
jit-friendly:

  * segment framing (eb_EnvSmooth / eb_BMcovary) becomes gathered frames with
    per-frame window rows — batched matmuls instead of per-channel loops;
  * the reference's dynamic above-threshold *compaction* (ebm_CepCoef,
    pyhaspi2.py:355-359) becomes a stable-sort gather that moves valid
    segments to the front plus masks — bit-equivalent for the valid region
    because the downstream convolutions see zeros after the valid count,
    exactly like np.convolve's implicit zero padding;
  * the ±1 ms cross-covariance (eb_BMcovary) evaluates all 49 lags as one
    batched einsum; the lag-normalisation windows (hard-coded MATLAB xcorr
    tables at pyhaspi2.py:564,571) are *computed* from the analysis window —
    they agree with the frozen tables to float precision;
  * the three-level segment histogram (eb_3LevelCovary) uses a fixed 1024-bin
    one-hot scatter + cumsum with the reference's round-half-up bin rule.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

FSAMP = 24000


def _corr_time(v: jnp.ndarray, kernel: np.ndarray, pad_lo: int,
               pad_hi: int) -> jnp.ndarray:
    """Correlate [time, channels] with a 1-D kernel along time via
    lax.conv (channels ride the batch dim — no [T, K, C] gather
    materialisation, which dominated runtime on TPU)."""
    lhs = v.T[:, None, :]                                  # [C, 1, T]
    rhs = jnp.asarray(kernel, v.dtype)[None, None, :]      # [1, 1, K]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, (1,), [(pad_lo, pad_hi)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out[:, 0, :].T                                  # [T, C]


# ---------------------------------------------------------------------------
# segment framing shared by eb_EnvSmooth / eb_BMcovary
# ---------------------------------------------------------------------------

def _n_segments(npts: int, nwin: int) -> int:
    return int(1 + npts // nwin + (npts - nwin // 2) // nwin)


@functools.lru_cache(maxsize=None)
def _seg_layout(npts: int, segsize_ms: int = 16, fsamp: int = FSAMP):
    """Static framing tables: index matrix [nseg, nwin] and window rows."""
    nwin = round(segsize_ms * 0.001 * fsamp)
    if nwin % 2:
        nwin += 1
    nhalf = nwin // 2
    window = np.hanning(nwin)
    nseg = _n_segments(npts, nwin)

    idx = (np.arange(nseg)[:, None] * nhalf + np.arange(nwin)[None, :])
    wmat = np.tile(window, (nseg, 1))
    # first segment: data r[0:nhalf] weighted by window[nhalf:]
    wmat[0] = 0.0
    wmat[0, :nhalf] = window[nhalf:]
    idx[0] = np.concatenate([np.arange(nhalf), np.zeros(nhalf, int)])
    # last segment: nhalf samples, window[:nhalf]
    wmat[-1, nhalf:] = 0.0
    valid = idx < npts
    idx = np.clip(idx, 0, npts - 1)
    wmat = wmat * valid
    wsum = window.sum()
    halfsum = window[nhalf:].sum()
    norms = np.full(nseg, wsum)
    norms[0] = norms[-1] = halfsum
    return idx, wmat, norms, nwin, nhalf, window


def env_smooth(env: jnp.ndarray, segsize_ms: int = 16,
               fsamp: int = FSAMP) -> jnp.ndarray:
    """Windowed segment averages (reference eb_EnvSmooth, pyhaspi2.py:673-703).

    env: [nchan, npts] -> [nchan, nseg]."""
    npts = env.shape[-1]
    idx, wmat, norms, _, _, _ = _seg_layout(npts, segsize_ms, fsamp)
    frames = env[..., idx]                                 # [nchan, nseg, nwin]
    return jnp.sum(frames * jnp.asarray(wmat, env.dtype), -1) / jnp.asarray(
        norms, env.dtype)


# ---------------------------------------------------------------------------
# mel-cepstral correlation (HASPI v1 / HASQI)
# ---------------------------------------------------------------------------

def _cep_basis(nbands: int, nbasis: int) -> np.ndarray:
    freq = np.arange(nbasis)
    k = np.arange(nbands)
    cepm = np.cos(freq[None, :] * np.pi * k[:, None] / (nbands - 1))
    return cepm / np.linalg.norm(cepm, axis=0, keepdims=True)


def melcor(x: jnp.ndarray, y: jnp.ndarray, thr: float = 2.5):
    """Cepstral correlation (reference eb_melcor, pyhaspi2.py:706-751).

    x, y: [nbands, nseg] smoothed envelopes in dB.
    Returns (m1, xy[nbasis]); the above-threshold selection is a mask (no
    convolution follows, so masking == compaction here).
    """
    nbands = x.shape[0]
    nbasis = 6
    cepm = jnp.asarray(_cep_basis(nbands, nbasis), x.dtype)
    xsum = 20.0 * jnp.log10(jnp.sum(10.0 ** (x / 20.0), axis=0) / nbands)
    sel = (xsum > thr).astype(x.dtype)                     # [nseg]
    nsel = jnp.maximum(jnp.sum(sel), 1.0)  # all-quiet: avoid 0/0 NaN

    xcep = cepm.T @ (x * sel)                              # [nbasis, nseg]
    ycep = cepm.T @ (y * sel)
    xmean = jnp.sum(xcep * sel, -1, keepdims=True) / nsel
    ymean = jnp.sum(ycep * sel, -1, keepdims=True) / nsel
    xcep = (xcep - xmean) * sel
    ycep = (ycep - ymean) * sel

    small = 1e-30
    xs = jnp.sum(xcep * xcep, -1)
    ys = jnp.sum(ycep * ycep, -1)
    xy = jnp.where((xs < small) | (ys < small), 0.0,
                   jnp.abs(jnp.sum(xcep * ycep, -1))
                   / jnp.sqrt(jnp.maximum(xs * ys, small)))
    m1 = jnp.sum(xy[1:]) / (nbasis - 1)
    return m1, xy


# ---------------------------------------------------------------------------
# BM cross-covariance (HASPI v1 / HASQI)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _xcorr_norms(segsize_ms: int = 16, fsamp: int = FSAMP,
                 lag_ms: float = 1.0):
    """1/xcorr(window) lag-normalisation rows; the reference freezes these as
    MATLAB outputs (pyhaspi2.py:564,571) — recomputed here."""
    nwin = round(segsize_ms * 0.001 * fsamp)
    if nwin % 2:
        nwin += 1
    maxlag = round(lag_ms * 0.001 * fsamp)
    window = np.hanning(nwin)
    nhalf = nwin // 2
    half = window[nhalf:]

    def inv_autocorr(w):
        full = np.correlate(w, w, "full")
        c = len(full) // 2
        return 1.0 / full[c - maxlag:c + maxlag + 1]

    return (inv_autocorr(window), inv_autocorr(half),
            1.0 / np.sum(window ** 2), 1.0 / np.sum(half ** 2), maxlag)


def bm_covary(xbm: jnp.ndarray, ybm: jnp.ndarray, segsize_ms: int = 16,
              fsamp: int = FSAMP):
    """Time-frequency segment cross-covariance (reference eb_BMcovary,
    pyhaspi2.py:550-659).

    xbm, ybm: [nchan, npts] -> (sigcov, msx, msy) each [nchan, nseg].
    """
    npts = xbm.shape[-1]
    idx, wmat, _, nwin, nhalf, window = _seg_layout(npts, segsize_ms, fsamp)
    wincorr, halfcorr, winsum2, halfsum2, maxlag = _xcorr_norms(
        segsize_ms, fsamp)
    nseg = idx.shape[0]

    wmat_j = jnp.asarray(wmat, xbm.dtype)
    segx = xbm[..., idx] * wmat_j                      # [nchan, nseg, nwin]
    segy = ybm[..., idx] * wmat_j
    # per-segment effective window length for the mean
    seg_len = np.full(nseg, float(nwin))
    seg_len[0] = seg_len[-1] = float(nhalf)
    seg_len_j = jnp.asarray(seg_len, xbm.dtype)[None, :, None]
    segx = segx - jnp.sum(segx, -1, keepdims=True) / seg_len_j
    segy = segy - jnp.sum(segy, -1, keepdims=True) / seg_len_j
    # the mean subtraction must not disturb the zero padding on the
    # half-length first/last segments — re-zero positions past seg_len
    live = jnp.asarray(np.arange(nwin)[None, :] < seg_len[:, None], xbm.dtype)
    segx = segx * live
    segy = segy * live

    ms_norm = np.full(nseg, winsum2)
    ms_norm[0] = ms_norm[-1] = halfsum2
    ms_norm_j = jnp.asarray(ms_norm, xbm.dtype)
    msx = jnp.sum(segx * segx, -1) * ms_norm_j         # [nchan, nseg]
    msy = jnp.sum(segy * segy, -1) * ms_norm_j

    # all 49 lags at once: xc[l] = sum_n segx[n] * segy[n + l - maxlag]
    lags = np.arange(-maxlag, maxlag + 1)
    segy_pad = jnp.pad(segy, ((0, 0), (0, 0), (maxlag, maxlag)))
    shift_idx = (np.arange(nwin)[None, :] + (lags + maxlag)[:, None])
    segy_l = segy_pad[..., shift_idx]                  # [nchan, nseg, 49, nwin]
    xc = jnp.einsum("cst,cslt->csl", segx, segy_l)     # [nchan, nseg, 49]

    corr_tbl = np.tile(wincorr, (nseg, 1))
    corr_tbl[0] = halfcorr
    corr_tbl[-1] = halfcorr
    mxy = jnp.max(jnp.abs(xc * jnp.asarray(corr_tbl, xbm.dtype)), -1)

    small = 1e-30
    sigcov = jnp.where((msx > small) & (msy > small),
                       mxy / jnp.sqrt(jnp.maximum(msx * msy, small)), 0.0)
    sigcov = jnp.clip(sigcov, 0.0, 1.0)
    return sigcov, 2.0 * msx, 2.0 * msy


# np.correlate(segx, segy)[center + l] = sum_n segx[n + l] * segy[n]
#   -> lag of x relative to y; the einsum above computes
#      sum_n segx[n] segy[n + l], i.e. the mirrored lag axis.  The subsequent
#      max over |lags| makes the orientation irrelevant (symmetric range).


# ---------------------------------------------------------------------------
# three-level covariance (HASPI v1)
# ---------------------------------------------------------------------------

_NBINS = 1024


def three_level_covary(sigcov: jnp.ndarray, sig_msx: jnp.ndarray,
                       thr: float = 2.5):
    """Low/mid/high-intensity covariance averages (reference
    eb_3LevelCovary, pyhaspi2.py:418-547), uniform weights (cov3 only —
    the SII-weighted variant covSII is computed but unused upstream)."""
    nbands, nseg = sigcov.shape
    sig_rms = jnp.sqrt(sig_msx)
    xsum_all = 20.0 * jnp.log10(
        jnp.sum(10.0 ** (sig_rms / 20.0), axis=0) / nbands)
    sel = xsum_all > thr                                  # [nseg]
    big = jnp.asarray(1e9, sigcov.dtype)
    xsum = jnp.where(sel, xsum_all, big)                  # exclude via +inf

    db_min = jnp.min(xsum)
    db_sel = jnp.where(sel, xsum_all, -big)
    db_max = jnp.max(db_sel)
    # round-half-up nearest-center binning at 0.5 dB steps
    kbin = jnp.clip(jnp.floor((db_sel - db_min) / 0.5 + 0.5).astype(jnp.int32),
                    0, _NBINS - 1)
    onehot = jax.nn.one_hot(kbin, _NBINS, dtype=sigcov.dtype)
    hist = jnp.sum(onehot * sel[:, None], axis=0)         # [nbins]
    xcum = jnp.cumsum(hist)
    xcum = xcum / xcum[-1]
    centers = db_min + 0.5 * jnp.arange(_NBINS, dtype=sigcov.dtype)
    nvalid_bins = jnp.clip(jnp.floor((db_max - db_min) / 0.5).astype(jnp.int32)
                           + 1, 1, _NBINS)
    in_range = jnp.arange(_NBINS) < nvalid_bins
    # edge[i] = last bin center with cumulative fraction below the reference's
    # literal thresholds 0.333 / 0.667 (pyhaspi2.py:471-475)
    edge0 = _last_below_ref(xcum, in_range, centers, 0.333)
    edge1 = _last_below_ref(xcum, in_range, centers, 0.667)

    levels = [
        sel & (xsum_all < edge0),
        sel & (xsum_all >= edge0) & (xsum_all < edge1),
        sel & (xsum_all >= edge1),
    ]
    weight = (sig_rms > thr).astype(sigcov.dtype) * sel[None, :]
    wcov = weight * sigcov
    cov3 = []
    for lv in levels:
        lvf = lv.astype(sigcov.dtype)[None, :]
        ssum = jnp.sum(wcov * lvf, -1)                    # [nbands]
        wsum = jnp.sum(weight * lvf, -1)
        nonzero = wsum > 0
        cov_ave = jnp.where(nonzero, ssum / jnp.maximum(wsum, 1.0), 0.0)
        ncount = jnp.sum(nonzero)
        cov3.append(jnp.sum(cov_ave) / ncount)
    return jnp.stack(cov3)


def _last_below_ref(xcum, in_range, centers, frac):
    m = (xcum < frac) & in_range
    has = jnp.any(m)
    pos = jnp.where(m, jnp.arange(xcum.shape[0]), -1).max()
    return jnp.where(has, centers[jnp.maximum(pos, 0)], 0.0)


# ---------------------------------------------------------------------------
# average covariance with synchronisation rolloff (HASQI v2)
# ---------------------------------------------------------------------------

def ave_covary2(sigcov: jnp.ndarray, sig_msx: jnp.ndarray, thr: float,
                cfreq: np.ndarray):
    """Reference eb_AveCovary2 (pyhaspi2.py:161-222)."""
    nchan = sigcov.shape[0]
    p = np.array([1, 3, 5, 5, 5, 5])
    fcut = 1000.0 * np.array([1.5, 2.0, 2.5, 3.0, 3.5, 4.0])
    fsync = np.sqrt(fcut[:, None] ** (2 * p[:, None]) /
                    (fcut[:, None] ** (2 * p[:, None]) +
                     cfreq[None, :] ** (2 * p[:, None])))  # [6, nchan]

    sig_rms = jnp.sqrt(sig_msx)
    xsum = 20.0 * jnp.log10(jnp.sum(10.0 ** (sig_rms / 20.0), 0) / nchan)
    seg_sel = (xsum > thr).astype(sigcov.dtype)            # [nseg]
    weight = (sig_rms > thr).astype(sigcov.dtype) * seg_sel[None, :]

    csum = jnp.sum(weight * sigcov)
    wsum = jnp.sum(weight)
    fsync_j = jnp.asarray(fsync, sigcov.dtype)
    fsum = jnp.einsum("kc,cs,cs->k", fsync_j, weight, sigcov)
    ssum = jnp.einsum("kc,cs->k", fsync_j, weight)
    avecov = jnp.where(wsum < 1.0, 0.0, csum / jnp.maximum(wsum, 1.0))
    # same quiet-reference guard for the sync-weighted averages: ssum == 0
    # exactly when wsum == 0, where avecov is already forced to 0
    syncov = jnp.where(ssum > 0.0, fsum / jnp.where(ssum > 0.0, ssum, 1.0),
                       0.0)
    return avecov, syncov


def spect_diff(xsl: jnp.ndarray, ysl: jnp.ndarray):
    """Loudness spectrum differences (reference eb_SpectDiff,
    pyhaspi2.py:224-251).  Returns (dloud, dnorm, dslope), each [3]."""
    nbands = xsl.shape[0]
    x = 10.0 ** (xsl / 20.0)
    y = 10.0 ** (ysl / 20.0)
    x = x / jnp.sum(x)
    y = y / jnp.sum(y)

    def stats(d):
        return jnp.stack([jnp.sum(jnp.abs(d)), nbands * jnp.std(d),
                          jnp.max(jnp.abs(d))])

    dloud = stats(x - y)
    dnorm = stats((x - y) / (x + y))
    dslope = stats((x[1:] - x[:-1]) - (y[1:] - y[:-1]))
    return dloud, dnorm, dslope


# ---------------------------------------------------------------------------
# HASPI v2 modulation chain
# ---------------------------------------------------------------------------

def env_filt_one(db: jnp.ndarray, fcut: float = 320.0, fsub: float = 2560.0,
                 fsamp: int = FSAMP) -> jnp.ndarray:
    """One signal's half of ebm_EnvFilt: [nchan, n] -> [nsub, nchan].
    Filtering is per-signal, so the clean side can be cached across epochs
    (haspi.haspi_v2_clean_24k)."""
    db = db.T
    tfilt = 0.7 * 1000.0 / fcut
    nfilt = round(0.001 * tfilt * fsamp)
    nhalf = nfilt // 2
    nfilt = 2 * nhalf
    benv = np.hanning(nfilt)
    benv = benv / benv.sum()
    # reference: np.convolve(x, benv)[nhalf : nhalf+nsamp]; benv is a
    # palindrome, so this equals correlation with pad_lo = nfilt-1-nhalf
    env = _corr_time(db, np.asarray(benv), nfilt - 1 - nhalf, nhalf)
    space = int(fsamp // fsub)
    return env[::space]


def env_filt(xdb: jnp.ndarray, ydb: jnp.ndarray, fcut: float = 320.0,
             fsub: float = 2560.0, fsamp: int = FSAMP):
    """320 Hz envelope LP filter + subsample (reference ebm_EnvFilt,
    pyhaspi2.py:378-414).  xdb, ydb: [nchan, n] -> [nsub, nchan]."""
    return (env_filt_one(xdb, fcut, fsub, fsamp),
            env_filt_one(ydb, fcut, fsub, fsamp))


def cep_coef(xdb: jnp.ndarray, ydb: jnp.ndarray, thr_cep: float = 2.5,
             thr_nerve: float = 0.1, nbasis: int = 6,
             key: jax.Array | None = None, noise_scale: float = 0.0):
    """Cepstral coefficients with silence-gated compaction (reference
    ebm_CepCoef, pyhaspi2.py:342-375).

    xdb, ydb: [nsub, nbands].  Returns (xcep, ycep, count): compacted-to-front
    coefficient tracks [nsub, nbasis] with `count` valid rows, zeros after.
    """
    nsub, nbands = xdb.shape
    cepm = jnp.asarray(_cep_basis(nbands, nbasis), xdb.dtype)
    xlin = 10.0 ** (xdb / 20.0)
    xsum = 20.0 * jnp.log10(jnp.sum(xlin, -1) / nbands)
    valid = xsum > thr_cep                                  # [nsub]
    # all-quiet signals have zero valid rows; the max(1) keeps the mean
    # subtractions (here and in mod_filt_corr) finite instead of 0/0 NaN
    count = jnp.maximum(jnp.sum(valid), 1)
    # stable compaction: valid rows to the front, order preserved
    order = jnp.argsort(~valid, stable=True)
    xv = xdb[order]
    yv = ydb[order]
    live = (jnp.arange(nsub) < count).astype(xdb.dtype)[:, None]
    if noise_scale != 0.0:
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        xv = xv + noise_scale * thr_nerve * jax.random.normal(
            k1, xv.shape, xv.dtype)
        yv = yv + noise_scale * thr_nerve * jax.random.normal(
            k2, yv.shape, yv.dtype)
    xcep = (xv @ cepm) * live
    ycep = (yv @ cepm) * live
    xcep = (xcep - jnp.sum(xcep, 0) / count) * live
    ycep = (ycep - jnp.sum(ycep, 0) / count) * live
    return xcep, ycep, count


@functools.lru_cache(maxsize=None)
def _mod_filters(fsub: float):
    """Modulation filterbank design (reference ebm_ModFilt,
    pyhaspi2.py:275-318): band centers, hann LP kernels, kernel half-lengths."""
    cf = np.array([2, 6, 10, 16, 25, 40, 64, 100, 160, 256], float)
    nmod = len(cf)
    edge = np.zeros(nmod + 1)
    edge[1], edge[2] = 4.0, 8.0
    for k in range(3, nmod + 1):
        edge[k] = cf[k - 1] ** 2 / edge[k - 1]
    fnyq = 0.5 * fsub
    nmod = int((edge < fnyq).sum()) - 1
    cf = cf[:nmod]
    t = np.full(nmod, 0.24)
    t[2:] = 0.24 * cf[2] / cf[2:]
    nfir = (2 * np.floor(t * fsub / 2)).astype(int)
    kernels = []
    for k in range(nmod):
        b = np.hanning(nfir[k] + 1)
        kernels.append(b / b.sum())
    return cf, kernels, (nfir // 2).astype(int)


def mod_filt_corr(xcep: jnp.ndarray, ycep: jnp.ndarray, count,
                  fsub: float = 2560.0) -> jnp.ndarray:
    """Modulation filterbank + envelope correlation (reference ebm_ModFilt +
    ebm_ModCorr, pyhaspi2.py:254-339) fused: returns aveCM [nmod].

    xcep, ycep: compacted [nsub, nbasis] tracks with `count` valid rows.

    All (band, signal, quadrature-leg) FIR passes run as ONE batched FFT
    convolution: the per-band lax.conv layout dispatched 40 tiny convs
    whose fixed per-op cost dominated (this stage was 33 of a 160 ms
    warm degraded-side HASPI chunk on v5e, tools/prof_haspi.py).  The
    kernel spectra are trace-time numpy constants; the per-band output
    offset (K-1-nhalf, reducing to nhalf for the symmetric hann kernels)
    is applied by static slices of the shared inverse transform.
    """
    nsub, nbasis = xcep.shape
    cf, kernels, nhalf = _mod_filters(fsub)
    nmod = len(cf)
    fnyq = 0.5 * fsub
    dt = xcep.dtype
    n = jnp.arange(1, nsub + 1, dtype=dt)
    live = (jnp.arange(nsub) < count).astype(dt)         # [nsub]

    # demod carriers, all bands at once (band 0: no demodulation)
    ph = (jnp.pi / fnyq) * jnp.asarray(cf, dt)[:, None] * n[None, :]
    co = jnp.sqrt(jnp.asarray(2.0, dt)) * jnp.cos(ph)    # [nmod, nsub]
    si = jnp.sqrt(jnp.asarray(2.0, dt)) * jnp.sin(ph)
    co = co.at[0].set(1.0)
    si = si.at[0].set(0.0)

    # POWER-OF-TWO size only: at this shape ([B, nmod, 4, nbasis, m]) the
    # usual 3*2^k grid is pathological on the TPU FFT — measured m=12288
    # at 37.9 ms vs m=16384 at 19.4 ms per warm 8-utt chunk (and a fused
    # depthwise-conv formulation at 103 ms; the r4 per-band lax.conv
    # layout at ~33 ms).  The ear core's large [B, 32, 98304] FFTs show
    # the OPPOSITE preference (98304 beats 131072 by 1.3x) — size class
    # matters, re-measure before changing either.
    need = nsub + max(int(k.shape[0]) for k in kernels)
    m = 1
    while m < need:
        m *= 2
    npdt = np.float64 if dt == jnp.float64 else np.float32
    # flipped-kernel spectra (correlation = convolution with the flipped
    # kernel; hann windows are symmetric, but don't rely on it)
    kf = np.stack([np.fft.rfft(k[::-1].astype(npdt), m) for k in kernels])
    kf_j = jnp.asarray(kf, jnp.complex128 if dt == jnp.float64
                       else jnp.complex64)               # [nmod, m/2+1]

    # only cepstral bases 1..5 reach the output (the final average is
    # over cm_all[:, 1:6]); slicing basis 0 out BEFORE the batched FFT
    # saves 1/6 of the transform work — XLA cannot DCE rows of one
    # batched FFT op
    xc5, yc5 = xcep[:, 1:6], ycep[:, 1:6]
    # [nmod, 4, 5, nsub]: (x_re, x_im, y_re, y_im) legs per band
    legs = jnp.stack([
        xc5.T[None] * co[:, None, :], -xc5.T[None] * si[:, None, :],
        yc5.T[None] * co[:, None, :], -yc5.T[None] * si[:, None, :],
    ], 1)
    conv = jnp.fft.irfft(jnp.fft.rfft(legs, m) * kf_j[:, None, None, :],
                         m)
    # per-band static output offset K-1-nhalf into the linear convolution
    outs = [jax.lax.dynamic_slice_in_dim(
        conv[k], int(kernels[k].shape[0]) - 1 - int(nhalf[k]), nsub, -1)
        for k in range(nmod)]
    f = jnp.stack(outs, 0).astype(dt)                    # [nmod, 4, 5, ns]
    xf = (f[:, 0] * co[:, None, :] - f[:, 1] * si[:, None, :]) * live
    yf = (f[:, 2] * co[:, None, :] - f[:, 3] * si[:, None, :]) * live

    small = 1e-30
    xm = jnp.sum(xf, -1, keepdims=True) / count
    ym = jnp.sum(yf, -1, keepdims=True) / count
    xf = (xf - xm) * live
    yf = (yf - ym) * live
    xs = jnp.sum(xf * xf, -1)                            # [nmod, 5]
    ys = jnp.sum(yf * yf, -1)
    cm5 = jnp.where((xs < small) | (ys < small), 0.0,
                    jnp.abs(jnp.sum(xf * yf, -1))
                    / jnp.sqrt(jnp.maximum(xs * ys, small)))
    return jnp.mean(cm5, axis=1)                         # ave over basis 2-6
