"""End-to-end enhancement pipelines: featurize -> G -> beta^2 -> resynthesis.

Two paths:

  * `enhance_utterance` — reference-exact single-utterance inference
    (reference: inference.py:80-115): centered STFT, IMCRA, generator mask,
    utterance-level energy normalisation beta^2 = sum(clean^6) /
    sum(mask * clean^6) (train_nele.py:133-138), band-gain resynthesis, and
    the exact-RMS renormalisation to 0.03 (inference.py:109).

  * `enhance_batch` — the TPU-native batched formulation the reference lacks
    (it is locked to batch_size=1, dataloader.py:90).  Utterances are
    reflect-padded *per utterance* on the host (data/pipeline.py) and then
    zero-padded to a bucket length, so a center=False STFT over the batch
    reproduces the reference's centered frames bit-for-bit for every valid
    frame; all masking downstream is exact, not approximate.

Frame-count bookkeeping (hop 256, n_fft 512, centered):
  valid_frames(n)  = 1 + n // 256
  output_length(n) = 256 * (n // 256)   # librosa iSTFT truncates the tail
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nelegan_tpu.config import Config, ImcraConfig
from nelegan_tpu.dsp.stft import stft, hann_periodic
from nelegan_tpu.dsp.erb import band_energy, interp_band_gain
from nelegan_tpu.dsp.imcra import imcra_estimate_psd
from nelegan_tpu.dsp.features import (featurize_speech, featurize_noise,
                                      resynthesize, rms)
from nelegan_tpu.models.generator import Generator

N_FFT = 512
HOP = 256


def valid_frames(n_samples) -> jnp.ndarray:
    return 1 + n_samples // HOP


# ---------------------------------------------------------------------------
# Reference-exact single-utterance path
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("p_power", "target_rms",
                                             "model_cfg"))
def enhance_utterance(gen_params, clean_wav: jnp.ndarray,
                      noise_wav: jnp.ndarray, p_power: float = 1.0 / 6.0,
                      target_rms: float = 0.03,
                      model_cfg=None) -> jnp.ndarray:
    """One utterance through the full reference inference path, jitted."""
    clean_band, clean_mag, clean_phase = featurize_speech(clean_wav, p_power)
    noise_band, _, _ = featurize_noise(noise_wav, p_power)

    gen = (Generator() if model_cfg is None
           else Generator.from_config(model_cfg))
    mask = gen.apply({"params": gen_params},
                     clean_band[None], noise_band[None])[0]
    clean_power = clean_band ** (1.0 / p_power)
    beta2 = jnp.sum(clean_power) / jnp.sum(mask * clean_power)
    alpha2 = mask * beta2

    wav = resynthesize(alpha2, clean_mag, clean_phase)
    return wav / rms(wav) * target_rms


# ---------------------------------------------------------------------------
# Batched path
# ---------------------------------------------------------------------------

def reflect_pad_batch(wavs: list[np.ndarray], n_max: int | None = None):
    """Host-side prep: per-utterance reflect pad (n_fft//2) then zero-pad to a
    common buffer.  Returns (padded [B, n_max + n_fft], lengths [B])."""
    pad = N_FFT // 2
    lens = np.array([len(w) for w in wavs], np.int32)
    n_max = int(n_max or lens.max())
    # int16 (raw PCM) stays int16: reflect-pad only copies samples, so
    # padding-then-converting on device equals converting-then-padding
    # bit-for-bit, at half the host->device transfer bytes (the device
    # tunnel here moves ~25 MB/s — transfer is the enhancement
    # pipeline's bottleneck, not compute)
    dt = np.int16 if wavs and wavs[0].dtype == np.int16 else np.float32
    out = np.zeros((len(wavs), n_max + N_FFT), dt)
    for i, w in enumerate(wavs):
        p = np.pad(w, (pad, pad), mode="reflect")
        out[i, :len(p)] = p
    return out, lens


class BatchFeatures(NamedTuple):
    clean_band: jnp.ndarray   # [B, T, 64]
    noise_band: jnp.ndarray   # [B, T, 64]
    clean_mag: jnp.ndarray    # [B, 257, T]
    clean_phase: jnp.ndarray  # [B, 257, T]
    frames: jnp.ndarray       # [B] valid frame counts
    lengths: jnp.ndarray      # [B] sample counts


@functools.partial(jax.jit, static_argnames=("p_power", "cfg"))
def featurize_batch(clean_padded: jnp.ndarray, noise_padded: jnp.ndarray,
                    lengths: jnp.ndarray, p_power: float = 1.0 / 6.0,
                    cfg: ImcraConfig = ImcraConfig()) -> BatchFeatures:
    """Batched featurization over host-pre-reflected utterances.

    Valid frames are bit-equal to the reference's per-utterance centered
    STFT; padded-tail frames are garbage and masked downstream.

    int16 inputs are raw PCM16 samples and are converted on device
    (x / 32768, identical to the host decoder data/wavio.py) — callers
    feeding the device through the remote tunnel should prefer them:
    half the transfer bytes for a bit-identical result.
    """
    if clean_padded.dtype == jnp.int16:
        clean_padded = clean_padded.astype(jnp.float32) / 32768.0
    if noise_padded.dtype == jnp.int16:
        noise_padded = noise_padded.astype(jnp.float32) / 32768.0
    cspec = stft(clean_padded, center=False)         # [B, 257, T]
    nspec = stft(noise_padded, center=False)
    cmag = jnp.abs(cspec)
    cphase = jnp.angle(cspec)
    cband = band_energy(jnp.swapaxes(cmag, -1, -2)) ** p_power
    npsd = jax.vmap(lambda s: imcra_estimate_psd(s, cfg))(nspec)
    nband = band_energy(jnp.sqrt(jnp.swapaxes(npsd, -1, -2))) ** p_power
    return BatchFeatures(cband, nband, cmag, cphase,
                         valid_frames(lengths), lengths)


def frame_mask(frames: jnp.ndarray, t: int) -> jnp.ndarray:
    """[B, t] 1.0 where the frame index is valid."""
    return (jnp.arange(t)[None, :] < frames[:, None])


def beta2_energy_norm(clean_band: jnp.ndarray, mask: jnp.ndarray,
                      fmask: jnp.ndarray, inv_p: float = 6.0) -> jnp.ndarray:
    """Utterance-level energy normalisation (reference train_nele.py:133-138),
    masked over valid frames.  Returns [B, 1, 1]."""
    clean_power = (clean_band ** inv_p) * fmask[..., None]
    num = jnp.sum(clean_power, axis=(1, 2))
    den = jnp.sum(mask * clean_power, axis=(1, 2))
    # an all-silent utterance has num == den == 0: its 0/0 would NaN the
    # whole row downstream; unity gain is the sensible degenerate value
    return jnp.where(den > 0.0, num / jnp.where(den > 0.0, den, 1.0),
                     1.0)[:, None, None]


@jax.jit
def istft_batch_tail_truncated(spec: jnp.ndarray,
                               frames: jnp.ndarray) -> jnp.ndarray:
    """Batched iSTFT for center=False spectrograms of pre-reflected signals.

    Invalid frames (>= per-sample frame count) are zeroed before overlap-add;
    within the valid output region every sample is covered by exactly two
    frames, so the squared-window normaliser is a tiled 256-periodic constant.
    Output sample i corresponds to original sample i; samples at or beyond
    256*(frames-1) are zeroed (the reference iSTFT truncates there).
    """
    fr = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=N_FFT, axis=-1)
    # window dtype must follow the frames (a float64 numpy window would
    # silently promote f32 audio under x64)
    fr = fr * jnp.asarray(hann_periodic(N_FFT), fr.dtype)
    t = fr.shape[-2]
    fr = fr * frame_mask(frames, t)[..., None]

    # overlap-add: out[f*HOP : f*HOP+N_FFT] += frame f
    a = fr[..., :HOP]                     # first half of each frame
    b = fr[..., HOP:]                     # second half
    b_shift = jnp.concatenate([jnp.zeros_like(b[:, :1]), b[:, :-1]], axis=1)
    ola = (a + b_shift).reshape(fr.shape[0], t * HOP)

    from nelegan_tpu.dsp.stft import ola_norm_half_overlap
    wsq = jnp.asarray(ola_norm_half_overlap(N_FFT), ola.dtype)
    y = ola / jnp.tile(wsq, t)
    # drop the leading half-window (reflect padding) and zero the tail
    y = y[:, HOP:]
    n = y.shape[-1]
    out_len = HOP * (frames - 1)          # [B]
    keep = jnp.arange(n)[None, :] < out_len[:, None]
    return jnp.where(keep, y, 0.0)


@jax.jit
def pcm16_quantize(wav: jnp.ndarray) -> jnp.ndarray:
    """Bit-exact device replica of the PCM16 disk round trip.

    Matches csrc/wavio.cpp write (clip to [-1,1], scale by 32768, clamp to
    32767, round half away from zero — libsndfile semantics) followed by
    the read path's int16/32768 scaling.  All steps are f32 IEEE ops, so a
    quantized device row equals the decoded file sample for sample; this
    lets band features of a *written* wav be computed without reading the
    file back (train/loop.py's enhanced-band pool insertion)."""
    v = jnp.clip(wav, -1.0, 1.0)
    s = jnp.minimum(v * jnp.float32(32768.0), jnp.float32(32767.0))
    q = jnp.where(s >= 0, jnp.floor(s + 0.5), jnp.ceil(s - 0.5))
    return q * jnp.float32(1.0 / 32768.0)


@jax.jit
def pcm16_quantize_i16(wav: jnp.ndarray) -> jnp.ndarray:
    """pcm16_quantize's integer form: the exact int16 samples the PCM16
    file will hold.  Fetching these instead of f32 halves the
    device->host transfer for every written wav (the enhance phases are
    transfer-bound through the remote tunnel); write them with
    data/wavio.write_wav_pcm16, whose int16 path skips re-quantization,
    for byte-identical files."""
    v = jnp.clip(wav, -1.0, 1.0)
    s = jnp.minimum(v * jnp.float32(32768.0), jnp.float32(32767.0))
    q = jnp.where(s >= 0, jnp.floor(s + 0.5), jnp.ceil(s - 0.5))
    return q.astype(jnp.int16)


@jax.jit
def reflect_pad_device(wav: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Device replica of reflect_pad_batch for device-resident rows.

    wav [B, n] (row i valid through lengths[i] >= 258 samples) ->
    [B, n + N_FFT] with a HOP-sample reflection at each row's own edges and
    zeros past lengths[i] + N_FFT, matching np.pad(w, (256, 256),
    'reflect') placed at the buffer head."""
    n = wav.shape[-1]
    j = jnp.arange(n + N_FFT)
    k = jnp.abs(j - HOP)                       # head reflection

    def row(w, length):
        lm = jnp.maximum(length - 1, 1)
        idx = lm - jnp.abs(lm - k)             # tail reflection
        out = w[jnp.clip(idx, 0, n - 1)]
        return jnp.where(j < length + N_FFT, out, 0.0)

    return jax.vmap(row)(wav, lengths)


@jax.jit
def active_speech_level_batch(wavs: jnp.ndarray) -> jnp.ndarray:
    """Vmapped ITU-T P.56 active speech level over a batch (BASELINE
    config 2's normalization variant; the reference ships asl_P56.py but
    never wires it in — here it is a first-class batch op).

    wavs: [B, n] -> active-speech RMS [B] (sqrt of the P.56 mean square)."""
    from nelegan_tpu.dsp.asl_p56 import asl_p56
    msq, _, _ = jax.vmap(lambda w: asl_p56(w, 16000, 16))(wavs)
    return jnp.sqrt(jnp.maximum(msq, 1e-12))


@functools.partial(jax.jit, static_argnames=("p_power", "target_rms",
                                             "model_cfg"))
def enhance_batch(gen_params, feats: BatchFeatures,
                  p_power: float = 1.0 / 6.0,
                  target_rms: float = 0.03, model_cfg=None):
    """Batched enhancement: returns (wavs [B, n], alpha2 [B, T, 64], out_lens).

    Matches the reference inference path per utterance (masked exactly), with
    the whole batch running as one XLA program.
    """
    t = feats.clean_band.shape[1]
    fmask = frame_mask(feats.frames, t).astype(feats.clean_band.dtype)
    gen = (Generator() if model_cfg is None
           else Generator.from_config(model_cfg))
    mask = gen.apply({"params": gen_params},
                     feats.clean_band, feats.noise_band)
    beta2 = beta2_energy_norm(feats.clean_band, mask, fmask,
                              inv_p=1.0 / p_power)
    alpha2 = mask * beta2

    gain = jnp.sqrt(interp_band_gain(alpha2))             # [B, T, 257]
    spec = (feats.clean_mag * jnp.exp(1j * feats.clean_phase)
            * jnp.swapaxes(gain, -1, -2))
    wav = istft_batch_tail_truncated(spec, feats.frames)

    out_len = HOP * (feats.frames - 1)
    denom = jnp.sqrt(jnp.sum(wav * wav, axis=-1)
                     / jnp.maximum(out_len, 1).astype(wav.dtype))
    # an all-zero row (sub-hop clip or silent input) has denom == 0; keep
    # it at zero rather than emitting a NaN row that poisons downstream
    # metric programs
    denom = jnp.where(denom > 0.0, denom, 1.0)
    wav = wav / denom[:, None] * target_rms
    return wav, alpha2, out_len
