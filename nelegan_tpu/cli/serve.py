"""Serving daemon — persistent enhancement service with dynamic batching.

The reference has no serving path at all (its inference.py is an offline
batch script, reference: inference.py:75-144); production deployment needs
a resident process that keeps the generator compiled and feeds the chip
full batches.  This daemon:

  * loads the generator once (native checkpoint or converted torch
    chkpt_GD.pt) and pre-compiles the enhancement program for the
    configured bucket lengths — a fresh remote-TPU compile costs 30-240 s
    (CLAUDE.md), so compiles happen at startup, never on a request;
  * collects concurrent requests into bucketed batches (same fixed-width
    padding as training: one compiled program per bucket length, padded to
    a fixed batch size so no request ever triggers a recompile);
  * runs all JAX dispatch on ONE worker thread while socket IO threads
    only move bytes and wait on per-request events.

Protocol (TCP, length-prefixed, little-endian, 16 kHz float32 PCM):

    request:  magic b'NELE' | u8 version=1 | u32 n | f32[n] clean
                                           | u32 m | f32[m] noise
    response: u32 k | f32[k] enhanced          (RMS-normalised to 0.03)
           or u32 0xFFFFFFFF | u32 len | utf-8 error message

`enhance_remote()` below is the matching client helper.

    python -m nelegan_tpu.cli.serve --checkpoint ./chkpt --port 7860 \
        [--batch-size 8] [--max-wait-ms 15] [--warmup-lengths 36864]
"""
from __future__ import annotations

import argparse
import queue
import socket
import struct
import threading
import time
from typing import List, Optional, Tuple

import numpy as np

MAGIC = b"NELE"
VERSION = 1
ERR = 0xFFFFFFFF
MAX_SAMPLES = 16000 * 120  # 2 minutes per signal: bounds request memory


# ----------------------------------------------------------------- wire IO
def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(n - len(buf), 1 << 20))
        if not chunk:
            raise ConnectionError("peer closed mid-message")
        buf.extend(chunk)
    return bytes(buf)


def _recv_f32(sock: socket.socket) -> np.ndarray:
    (n,) = struct.unpack("<I", _recv_exact(sock, 4))
    if n > MAX_SAMPLES:
        raise ValueError(f"signal too long ({n} samples > {MAX_SAMPLES})")
    return np.frombuffer(_recv_exact(sock, 4 * n), "<f4").copy()


def _send_f32(sock: socket.socket, wav: np.ndarray) -> None:
    wav = np.ascontiguousarray(wav, "<f4")
    sock.sendall(struct.pack("<I", wav.size) + wav.tobytes())


def _send_error(sock: socket.socket, msg: str) -> None:
    data = msg.encode()[:4096]
    sock.sendall(struct.pack("<II", ERR, len(data)) + data)


def enhance_remote(host: str, port: int, clean: np.ndarray,
                   noise: np.ndarray, timeout: float = 60.0) -> np.ndarray:
    """Client helper: one round trip against a running daemon."""
    with socket.create_connection((host, port), timeout=timeout) as s:
        s.sendall(MAGIC + struct.pack("<B", VERSION))
        _send_f32(s, clean)
        _send_f32(s, noise)
        (k,) = struct.unpack("<I", _recv_exact(s, 4))
        if k == ERR:
            (n,) = struct.unpack("<I", _recv_exact(s, 4))
            raise RuntimeError(_recv_exact(s, n).decode())
        return np.frombuffer(_recv_exact(s, 4 * k), "<f4").copy()


# ----------------------------------------------------------------- batcher
class _Request:
    __slots__ = ("clean", "noise", "event", "result", "error")

    def __init__(self, clean: np.ndarray, noise: np.ndarray):
        self.clean = clean
        self.noise = noise
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[str] = None

    def wait(self) -> np.ndarray:
        self.event.wait()
        if self.error is not None:
            raise RuntimeError(self.error)
        return self.result


class EnhanceServer:
    """Dynamic-batching enhancement service around one generator."""

    def __init__(self, gen_params, batch_size: int = 8,
                 max_wait_ms: float = 15.0, bucket_quant: int = 4096,
                 cfg=None):
        from nelegan_tpu.config import Config
        # cfg should be the checkpoint's own config
        # (checkpoint.config_for_checkpoint) so a non-default model shape
        # builds the matching Generator; Config() is the fallback
        self.cfg = Config() if cfg is None else cfg
        self.params = gen_params
        self.batch_size = batch_size
        self.max_wait = max_wait_ms / 1000.0
        self.bucket_quant = bucket_quant
        self.queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0}
        self._worker = threading.Thread(target=self._batch_loop, daemon=True)
        self._ready = threading.Event()
        self._stopping = threading.Event()
        self._started = False

    # --- device side ---------------------------------------------------
    def _make_step(self):
        import jax
        from nelegan_tpu import pipeline
        cfg = self.cfg

        @jax.jit
        def step(params, clean_p, noise_p, lengths):
            feats = pipeline.featurize_batch(clean_p, noise_p, lengths,
                                             cfg.train.p_power)
            wav, _, out_len = pipeline.enhance_batch(
                params, feats, cfg.train.p_power, cfg.train.target_rms,
                model_cfg=cfg.model)
            return wav, out_len
        return step

    def _bucket(self, n: int) -> int:
        q = self.bucket_quant
        return -(-max(n, 1) // q) * q

    def start(self) -> None:
        if not self._started:
            self._started = True
            self._worker.start()
            self._ready.wait()

    def warmup(self, lengths: List[int]) -> None:
        """Compile the serving program for each bucket ahead of traffic —
        synthetic requests through the normal queue, so the warmed path is
        exactly the served path."""
        self.start()
        rng = np.random.RandomState(0)
        for n in lengths:
            wav = 0.03 * rng.randn(self._bucket(n)).astype(np.float32)
            req = _Request(wav, wav)
            self.queue.put(req)
            req.wait()

    def _batch_loop(self):
        self._jit = self._make_step()
        self._ready.set()
        while not self._stopping.is_set():
            try:
                first = self.queue.get(timeout=0.25)
            except queue.Empty:
                continue
            if first is None:
                break
            group = [first]
            deadline = time.perf_counter() + self.max_wait
            # collect same-bucket requests until the batch fills or the
            # window closes; different-bucket arrivals go back in the queue
            blen = self._bucket(min(first.clean.size, first.noise.size))
            requeue = []
            while len(group) < self.batch_size:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    r = self.queue.get(timeout=left)
                except queue.Empty:
                    break
                if r is None:
                    self._stopping.set()
                    break
                if self._bucket(min(r.clean.size, r.noise.size)) == blen:
                    group.append(r)
                else:
                    requeue.append(r)
            for r in requeue:
                self.queue.put(r)
            self._run_group(group, blen)
        self._drain()

    def _run_group(self, group: List[_Request], blen: int) -> None:
        from nelegan_tpu import pipeline
        try:
            cleans, noises = [], []
            for r in group:
                n = min(r.clean.size, r.noise.size)
                cleans.append(r.clean[:n])
                noises.append(r.noise[:n])
            # pad to the fixed batch size by repeating the last row: every
            # request reuses one compiled (batch, bucket) program
            while len(cleans) < self.batch_size:
                cleans.append(cleans[-1])
                noises.append(noises[-1])
            clean_p, lengths = pipeline.reflect_pad_batch(cleans, blen)
            noise_p, _ = pipeline.reflect_pad_batch(noises, blen)
            wavs, out_lens = self._jit(self.params, clean_p, noise_p,
                                       lengths)
            wavs = np.asarray(wavs)
            out_lens = np.asarray(out_lens)
            for i, r in enumerate(group):
                r.result = wavs[i, :int(out_lens[i])]
                r.event.set()
            self.stats["requests"] += len(group)
            self.stats["batches"] += 1
        except Exception as e:  # noqa: BLE001 — report to the waiting client
            for r in group:
                r.error = f"{type(e).__name__}: {e}"
                r.event.set()

    def _drain(self):
        while True:
            try:
                r = self.queue.get_nowait()
            except queue.Empty:
                return
            if r is not None:
                r.error = "server shutting down"
                r.event.set()

    # --- socket side ---------------------------------------------------
    def _client(self, sock: socket.socket) -> None:
        with sock:
            try:
                while True:
                    try:
                        head = _recv_exact(sock, 5)
                    except ConnectionError:
                        return  # clean disconnect between requests
                    if head[:4] != MAGIC or head[4] != VERSION:
                        _send_error(sock, "bad magic/version")
                        return
                    req = _Request(_recv_f32(sock), _recv_f32(sock))
                    if req.clean.size == 0 or req.noise.size == 0:
                        _send_error(sock, "empty signal")
                        continue
                    self.queue.put(req)
                    req.event.wait()
                    if req.error is not None:
                        _send_error(sock, req.error)
                    else:
                        _send_f32(sock, req.result)
            except (ConnectionError, ValueError, OSError) as e:
                try:
                    _send_error(sock, str(e))
                except OSError:
                    pass

    def serve(self, host: str = "127.0.0.1", port: int = 7860,
              ready_event: Optional[threading.Event] = None
              ) -> Tuple[str, int]:
        """Blocking accept loop.  Pass port=0 for an ephemeral port; the
        bound address is stored on `self.address` before `ready_event`
        fires (for tests running the server in a thread)."""
        self.start()
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((host, port))
        srv.listen(64)
        srv.settimeout(0.25)
        self.address = srv.getsockname()
        if ready_event is not None:
            ready_event.set()
        print(f"serving on {self.address[0]}:{self.address[1]} "
              f"(batch={self.batch_size}, wait={self.max_wait * 1e3:.0f} ms)")
        try:
            while not self._stopping.is_set():
                try:
                    conn, _ = srv.accept()
                except socket.timeout:
                    continue
                threading.Thread(target=self._client, args=(conn,),
                                 daemon=True).start()
        finally:
            srv.close()
        return self.address

    def stop(self):
        self._stopping.set()
        self.queue.put(None)
        if self._started:
            self._worker.join(timeout=10)


# ----------------------------------------------------------------- CLI
def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir or .msgpack file")
    p.add_argument("--torch-checkpoint", default=None,
                   help="reference chkpt_GD.pt")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=15.0)
    p.add_argument("--warmup-lengths", default="36864",
                   help="comma-separated sample counts to pre-compile "
                        "(empty to skip)")
    p.add_argument("--platform", default=None)
    return p


def load_params(checkpoint: Optional[str], torch_checkpoint: Optional[str]):
    import jax
    from nelegan_tpu.config import Config
    from nelegan_tpu.train import gan
    from nelegan_tpu.train.checkpoint import (config_for_checkpoint,
                                              load_checkpoint,
                                              load_reference_checkpoint)
    state = gan.init_train_state(jax.random.PRNGKey(0),
                                 config_for_checkpoint(checkpoint))
    if torch_checkpoint:
        state = load_reference_checkpoint(torch_checkpoint, state)
    elif checkpoint:
        state, _, epoch, _ = load_checkpoint(checkpoint, state)
        print(f"loaded checkpoint epoch {epoch}")
    else:
        raise SystemExit("need --checkpoint or --torch-checkpoint")
    return state.gen_params


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from nelegan_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    params = load_params(args.checkpoint, args.torch_checkpoint)
    from nelegan_tpu.train.checkpoint import config_for_checkpoint
    server = EnhanceServer(params, batch_size=args.batch_size,
                           max_wait_ms=args.max_wait_ms,
                           cfg=config_for_checkpoint(args.checkpoint))
    warm = [int(x) for x in args.warmup_lengths.split(",") if x.strip()]
    if warm:
        t0 = time.perf_counter()
        server.warmup(warm)
        print(f"warmed {len(warm)} bucket(s) in "
              f"{time.perf_counter() - t0:.1f} s")
    try:
        server.serve(args.host, args.port)
    except KeyboardInterrupt:
        pass
    server.stop()


if __name__ == "__main__":
    main()
