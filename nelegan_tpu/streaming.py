"""Frame-streaming low-latency enhancement — a capability the reference lacks.

The reference generator is *causal by construction* — Chomp'd convolutions
plus cumulative LayerNorm (reference: model.py:31-40, 168-205) — but the
reference pipeline only ever runs it offline over whole utterances
(inference.py:80-115).  This module turns that latent causality into a real
streaming enhancer: audio goes in hop-sized pieces, enhanced audio comes out
with a fixed 512-sample (32 ms) algorithmic latency, and the emitted samples
are **bit-identical** to the offline pipeline's output at the same frames
(verified in tests/test_streaming.py), with one documented exception:

  * the utterance-level energy normalisation beta^2 = sum(clean^6) /
    sum(mask*clean^6) (reference train_nele.py:133-138) is non-causal; the
    streaming path uses its causal counterpart — the same ratio over all
    frames *so far* — which converges to the offline value by the final
    frame.  (The offline `pipeline.enhance_utterance` also RMS-renormalises
    the finished utterance to 0.03, reference inference.py:109; a live
    stream cannot know its final RMS, so deployment is expected to run AGC
    downstream, and the streaming output is un-renormalised.)

Everything stateful is carried in an explicit `StreamState` pytree, so the
per-chunk step is one jitted, TPU-resident program:

  * STFT framing: the host slices the (reflect-padded) sample stream into
    centered 512/256 frames exactly like dsp.stft;
  * IMCRA: the dsp.imcra scan step, carried across chunks;
  * generator: each causal conv carries its last (k-1) input frames; each
    cumulative LayerNorm carries (frame count, running sum, running power);
  * overlap-add iSTFT: one 256-sample frame-overlap tail.  With hop =
    n_fft/2 the interior squared-window normalisation is a fixed 256-sample
    profile, so every emitted block normalises identically — no edge cases.

Latency accounting: emitting enhanced samples [256(t-1), 256t) requires
input samples through 256t + 256 (the centered frame t), i.e. 512 samples
of lookahead = 32 ms at 16 kHz, independent of chunk size.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nelegan_tpu.config import ImcraConfig
from nelegan_tpu.dsp.stft import hann_periodic
from nelegan_tpu.dsp.erb import band_energy, interp_band_gain
from nelegan_tpu.dsp.imcra import imcra_init, imcra_step, _State as ImcraState
from nelegan_tpu.models.generator import Generator

N_FFT = 512
HOP = 256


class StreamState(NamedTuple):
    """All recurrent state of the streaming enhancer (a jit-able pytree)."""
    imcra: ImcraState
    frame_idx: jnp.ndarray            # absolute frame counter (int32)
    conv: Tuple[jnp.ndarray, ...]     # per conv layer: last (k-1) input frames
    cln_cnt: jnp.ndarray              # per cLN layer: frames seen [L]
    cln_sum: jnp.ndarray              # per cLN layer: running sum [L]
    cln_pow: jnp.ndarray              # per cLN layer: running power [L]
    beta_num: jnp.ndarray             # running sum clean^6
    beta_den: jnp.ndarray             # running sum mask * clean^6
    ola_tail: jnp.ndarray             # overlap-add carry [hop]


def _layer_shapes(gen: Generator):
    """(kernel, in_features) per conv layer of the generator stack."""
    ks = ([gen.kernel_first]
          + [gen.kernel_mid] * (gen.n_blocks - 2)
          + [gen.kernel_last])
    ins = ([2 * gen.n_bands] + [gen.hidden] * (gen.n_blocks - 1))
    return list(zip(ks, ins))


def init_stream_state(gen: Generator = Generator(), dtype=jnp.float32,
                      n_bins: int = N_FFT // 2 + 1,
                      imcra_cfg: ImcraConfig = ImcraConfig()) -> StreamState:
    layers = _layer_shapes(gen)
    return StreamState(
        imcra=imcra_init(n_bins, jnp.result_type(dtype, jnp.float32),
                         imcra_cfg),
        frame_idx=jnp.zeros((), jnp.int32),
        conv=tuple(jnp.zeros((k - 1, cin), dtype) for k, cin in layers),
        cln_cnt=jnp.zeros((len(layers),), dtype),
        cln_sum=jnp.zeros((len(layers),), dtype),
        cln_pow=jnp.zeros((len(layers),), dtype),
        beta_num=jnp.zeros((), dtype),
        beta_den=jnp.zeros((), dtype),
        ola_tail=jnp.zeros((HOP,), dtype),
    )


def _causal_conv_chunk(x, kernel, bias, carry):
    """VALID causal conv over a chunk: x [F, Cin] with carried left context
    [k-1, Cin] -> ([F, Cout], new carry).  k matmuls ride the MXU."""
    k = kernel.shape[0]
    xin = jnp.concatenate([carry, x], axis=0)        # [k-1+F, Cin]
    f = x.shape[0]
    y = bias + sum(xin[j:j + f] @ kernel[j] for j in range(k))
    return y, xin[xin.shape[0] - (k - 1):]


def _cln_chunk(x, gain, bias, cnt0, sum0, pow0, eps=1e-8):
    """Cumulative LayerNorm over a chunk with carried running statistics.
    Matches models.generator.CumulativeLayerNorm exactly at every frame."""
    c = x.shape[-1]
    cum_sum = sum0 + jnp.cumsum(jnp.sum(x, axis=-1))
    cum_pow = pow0 + jnp.cumsum(jnp.sum(x * x, axis=-1))
    t = x.shape[0]
    cnt = (c * (cnt0 + 1.0 + jnp.arange(t, dtype=x.dtype)))
    mean = cum_sum / cnt
    var = (cum_pow - 2.0 * mean * cum_sum) / cnt + mean * mean
    y = (x - mean[:, None]) / jnp.sqrt(var + eps)[:, None]
    return y * gain + bias, cnt0 + t, cum_sum[-1], cum_pow[-1]


def _generator_chunk(params, gen: Generator, state: StreamState, clean_band,
                     noise_band):
    """Streaming-stateful generator forward on a [F, 64]x2 feature chunk.
    Produces exactly Generator.__call__'s output at these frames."""
    lrelu = lambda v: jnp.where(v >= 0, v, gen.leaky_slope * v)
    x = jnp.concatenate([clean_band, noise_band], axis=-1)   # [F, 128]

    new_conv = []
    cnts, sums, pows = [], [], []
    for i in range(gen.n_blocks):
        cp = params[f"block{i}_conv"]["Conv_0"]
        x, carry = _causal_conv_chunk(x, cp["kernel"], cp["bias"],
                                      state.conv[i])
        new_conv.append(carry)
        np_ = params[f"block{i}_cln"]
        x, cnt, s, p = _cln_chunk(x, np_["gain"], np_["bias"],
                                  state.cln_cnt[i], state.cln_sum[i],
                                  state.cln_pow[i])
        cnts.append(cnt)
        sums.append(s)
        pows.append(p)
        x = lrelu(x)

    x = lrelu(x @ params["fc1"]["kernel"] + params["fc1"]["bias"])
    x = x @ params["fc2"]["kernel"] + params["fc2"]["bias"]
    mask = jnp.exp(gen.mask_bound * jnp.tanh(x))
    return mask, tuple(new_conv), (jnp.stack(cnts), jnp.stack(sums),
                                   jnp.stack(pows))


@functools.lru_cache(maxsize=None)
def _ola_norm() -> np.ndarray:
    """Interior squared-window OLA normalisation profile [hop] — shared
    with the offline OLA path (one source of truth for the bit-exact
    streaming/offline parity)."""
    from nelegan_tpu.dsp.stft import ola_norm_half_overlap
    return ola_norm_half_overlap(N_FFT)


@functools.partial(jax.jit, static_argnames=("gen", "p_power", "imcra_cfg"))
def streaming_step(gen_params, state: StreamState, clean_frames: jnp.ndarray,
                   noise_frames: jnp.ndarray, gen: Generator = Generator(),
                   p_power: float = 1.0 / 6.0,
                   imcra_cfg: ImcraConfig = ImcraConfig()):
    """Process F centered STFT frames; emit F hop-blocks of enhanced audio.

    Args:
      gen_params: the flax Generator "params" tree (same tree the offline
        path uses — streaming needs no weight conversion).
      clean_frames / noise_frames: [F, 512] sample frames (host-framed from
        the padded stream; see StreamingEnhancer).
    Returns:
      (new_state, out [F, hop]): out[t] holds enhanced samples for untrimmed
      block frame_idx + t; the stream's very first block is the centering
      pad and is dropped by the caller.
    """
    dt = clean_frames.dtype
    win = jnp.asarray(hann_periodic(N_FFT), dt)

    spec_c = jnp.fft.rfft(clean_frames * win, axis=-1)     # [F, 257]
    mag_c = jnp.abs(spec_c)
    clean_band = band_energy(mag_c) ** p_power             # [F, 64]

    spec_n = jnp.fft.rfft(noise_frames * win, axis=-1)
    y2 = (spec_n.real ** 2 + spec_n.imag ** 2).astype(
        jnp.result_type(dt, jnp.float32))

    def imcra_scan(st, inp):
        y2_l, l = inp
        return imcra_step(st, y2_l, l, imcra_cfg)

    f = clean_frames.shape[0]
    ls = state.frame_idx + jnp.arange(f, dtype=jnp.int32)
    imcra_new, psd = jax.lax.scan(imcra_scan, state.imcra, (y2, ls))
    noise_band = band_energy(jnp.sqrt(psd).astype(dt)) ** p_power

    mask, conv_new, (cln_cnt, cln_sum, cln_pow) = _generator_chunk(
        gen_params, gen, state, clean_band, noise_band)

    # causal beta^2: cumulative energy-preservation ratio up to each frame
    clean_power = clean_band ** (1.0 / p_power)
    num = state.beta_num + jnp.cumsum(jnp.sum(clean_power, axis=-1))
    den = state.beta_den + jnp.cumsum(jnp.sum(mask * clean_power, axis=-1))
    alpha2 = mask * (num / jnp.maximum(den, 1e-30))[:, None]

    # resynthesis: band gains -> bin gains -> spectra -> OLA
    gain = jnp.sqrt(interp_band_gain(alpha2))              # [F, 257]
    contrib = jnp.fft.irfft(spec_c * gain, n=N_FFT, axis=-1) * win
    heads = contrib[:, :HOP]                               # [F, 256]
    tails = contrib[:, HOP:]
    prev = jnp.concatenate([state.ola_tail[None], tails[:-1]], axis=0)
    out = (heads + prev) / jnp.asarray(_ola_norm(), dt)

    new = StreamState(
        imcra=imcra_new, frame_idx=state.frame_idx + f, conv=conv_new,
        cln_cnt=cln_cnt, cln_sum=cln_sum, cln_pow=cln_pow,
        beta_num=num[-1], beta_den=den[-1], ola_tail=tails[-1])
    return new, out


@functools.partial(jax.jit, static_argnames=("gen", "p_power", "imcra_cfg"))
def streaming_step_batch(gen_params, states: StreamState,
                         clean_frames: jnp.ndarray,
                         noise_frames: jnp.ndarray,
                         gen: Generator = Generator(),
                         p_power: float = 1.0 / 6.0,
                         imcra_cfg: ImcraConfig = ImcraConfig()):
    """Serve B concurrent streams in one device program.

    `states` is a StreamState whose every leaf carries a leading batch
    axis (stack B single-stream states with
    ``jax.tree.map(lambda *xs: jnp.stack(xs), *states)``);
    clean_frames / noise_frames are [B, F, 512].  Returns
    (batched new states, out [B, F, hop]).  Each stream advances exactly
    as it would alone (vmap over the single-stream step), so a serving
    frontend can multiplex independent callers onto one chip.
    """
    def step(st, fc, fn):
        return streaming_step(gen_params, st, fc, fn, gen, p_power,
                              imcra_cfg)

    return jax.vmap(step)(states, clean_frames, noise_frames)


class StreamingEnhancer:
    """Host-side chunked driver around `streaming_step`.

    Feed arbitrary-size sample chunks with `process`; call `flush` at end of
    stream.  Exactly `hop * (n // hop)` samples come out for `n` samples in
    (the offline pipeline's output length).  Processing runs in fixed
    `chunk_frames`-frame groups plus a single-frame drain program, so the
    whole stream costs at most two XLA compilations.
    """

    LATENCY_SAMPLES = N_FFT  # 32 ms at 16 kHz

    def __init__(self, gen_params, gen: Generator = Generator(),
                 p_power: float = 1.0 / 6.0,
                 imcra_cfg: ImcraConfig = ImcraConfig(),
                 chunk_frames: int = 8, dtype=np.float32):
        self._params = gen_params
        self._gen = gen
        self._p_power = p_power
        self._imcra_cfg = imcra_cfg
        self._chunk = max(1, chunk_frames)
        self._dtype = dtype
        self.reset()

    def reset(self):
        self._state = init_stream_state(self._gen, self._dtype,
                                        imcra_cfg=self._imcra_cfg)
        self._pre_c = np.zeros((0,), self._dtype)   # raw head (pre-start)
        self._pre_n = np.zeros((0,), self._dtype)
        self._buf_c = np.zeros((0,), self._dtype)   # padded-stream leftover
        self._buf_n = np.zeros((0,), self._dtype)
        self._tail_c = np.zeros((0,), self._dtype)  # last raw samples
        self._tail_n = np.zeros((0,), self._dtype)
        self._frames_c: list[np.ndarray] = []       # frames awaiting a chunk
        self._frames_n: list[np.ndarray] = []
        self._started = False
        self._first_block_dropped = False
        self._flushed = False

    # -- internals ---------------------------------------------------------

    def _ingest(self, clean: np.ndarray, noise: np.ndarray):
        clean = np.asarray(clean, self._dtype).reshape(-1)
        noise = np.asarray(noise, self._dtype).reshape(-1)
        if clean.shape != noise.shape:
            raise ValueError("clean and noise chunks must be equal length")
        for name in ("c", "n"):
            raw = clean if name == "c" else noise
            tail = getattr(self, f"_tail_{name}")
            tail = np.concatenate([tail, raw])[-(HOP + 1):]
            setattr(self, f"_tail_{name}", tail)
        if not self._started:
            self._pre_c = np.concatenate([self._pre_c, clean])
            self._pre_n = np.concatenate([self._pre_n, noise])
            if len(self._pre_c) >= HOP + 1:
                # centering reflect pad: x[hop], ..., x[1] before x[0]
                self._buf_c = np.concatenate(
                    [self._pre_c[HOP:0:-1], self._pre_c])
                self._buf_n = np.concatenate(
                    [self._pre_n[HOP:0:-1], self._pre_n])
                self._pre_c = self._pre_n = np.zeros((0,), self._dtype)
                self._started = True
        else:
            self._buf_c = np.concatenate([self._buf_c, clean])
            self._buf_n = np.concatenate([self._buf_n, noise])
        # slice complete frames off the padded stream
        if self._started:
            self._slice_frames()

    def _slice_frames(self) -> None:
        """Move complete N_FFT frames from the padded stream buffers into
        the pending-frame queues (shared by mid-stream ingest and flush, so
        end-of-stream framing can never diverge from mid-stream framing)."""
        while len(self._buf_c) >= N_FFT:
            self._frames_c.append(self._buf_c[:N_FFT].copy())
            self._frames_n.append(self._buf_n[:N_FFT].copy())
            self._buf_c = self._buf_c[HOP:]
            self._buf_n = self._buf_n[HOP:]

    def _run(self, n_frames: int) -> np.ndarray:
        fc = jnp.asarray(np.stack(self._frames_c[:n_frames]))
        fn = jnp.asarray(np.stack(self._frames_n[:n_frames]))
        del self._frames_c[:n_frames], self._frames_n[:n_frames]
        self._state, out = streaming_step(
            self._params, self._state, fc, fn, self._gen, self._p_power,
            self._imcra_cfg)
        out = np.asarray(out).reshape(-1)
        if not self._first_block_dropped:
            out = out[HOP:]
            self._first_block_dropped = True
        return out

    def _drain(self, all_pending: bool) -> list[np.ndarray]:
        outs = []
        while len(self._frames_c) >= self._chunk:
            outs.append(self._run(self._chunk))
        if all_pending:
            while self._frames_c:
                outs.append(self._run(1))
        return outs

    # -- public API ----------------------------------------------------------

    def process(self, clean: np.ndarray, noise: np.ndarray) -> np.ndarray:
        """Feed one chunk of (clean speech, near-end noise) samples; returns
        whatever enhanced samples became available (possibly empty)."""
        if self._flushed:
            raise RuntimeError("stream already flushed; call reset()")
        self._ingest(clean, noise)
        outs = self._drain(all_pending=False)
        return (np.concatenate(outs) if outs
                else np.zeros((0,), self._dtype))

    def flush(self) -> np.ndarray:
        """End of stream: applies the final centering pad and returns the
        remaining enhanced samples."""
        if self._flushed:
            return np.zeros((0,), self._dtype)
        self._flushed = True
        if not self._started:
            # tiny stream (<= hop samples): pad-and-frame it in one go
            # (np.pad handles the repeated reflection short signals need)
            if len(self._pre_c) < 2:
                return np.zeros((0,), self._dtype)
            self._buf_c = np.pad(self._pre_c, HOP, mode="reflect")
            self._buf_n = np.pad(self._pre_n, HOP, mode="reflect")
            self._started = True
        else:
            # final reflect pad: x[n-2], ..., x[n-hop-1]
            sfx_c = self._tail_c[-2:-(HOP + 2):-1]
            sfx_n = self._tail_n[-2:-(HOP + 2):-1]
            self._buf_c = np.concatenate([self._buf_c, sfx_c])
            self._buf_n = np.concatenate([self._buf_n, sfx_n])
        self._slice_frames()
        outs = self._drain(all_pending=True)
        return (np.concatenate(outs) if outs
                else np.zeros((0,), self._dtype))
