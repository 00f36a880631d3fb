"""Wav I/O: ctypes bindings for the native loader with a numpy fallback.

Replaces the reference's librosa.load / soundfile.write host path
(reference: dataloader.py:34-37, train_nele.py:198).  The native library
(csrc/wavio.cpp) decodes a whole batch with a thread pool inside the
process; build it with `python -m nelegan_tpu.data.wavio build` or via
tools/build_native.sh.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "wavio.cpp")
_LIB_PATH = os.path.join(_REPO_ROOT, "csrc", "libwavio.so")

_lib = None


def build_native(force: bool = False) -> str | None:
    """Compile csrc/wavio.cpp -> libwavio.so (g++, -O2)."""
    if os.path.exists(_LIB_PATH) and not force:
        if not os.path.exists(_SRC) or (os.path.getmtime(_LIB_PATH)
                                        >= os.path.getmtime(_SRC)):
            return _LIB_PATH
    if not os.path.exists(_SRC):
        return None
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC,
           "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def _packaged_lib() -> str | None:
    """Artifact built by setup.py (nelegan_tpu.data._wavio_native) for
    pip installs, where the in-repo csrc/ tree is absent.  It is a plain
    shared library (C symbols, loaded with ctypes), not an importable
    Python module."""
    import glob
    here = os.path.dirname(os.path.abspath(__file__))
    hits = glob.glob(os.path.join(here, "_wavio_native*.so"))
    return hits[0] if hits else None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    path = build_native()
    if path is None or not os.path.exists(path):
        path = _packaged_lib()
    if path is None or not os.path.exists(path):
        _lib = False
        return _lib
    lib = ctypes.CDLL(path)
    lib.wavio_read.restype = ctypes.c_int32
    lib.wavio_read.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_float),
                               ctypes.c_int32,
                               ctypes.POINTER(ctypes.c_int32)]
    lib.wavio_length.restype = ctypes.c_int32
    lib.wavio_length.argtypes = [ctypes.c_char_p]
    lib.wavio_read_batch.restype = None
    lib.wavio_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32]
    lib.wavio_write_pcm16.restype = ctypes.c_int32
    lib.wavio_write_pcm16.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_int32, ctypes.c_int32]
    _lib = lib
    return _lib


def native_available() -> bool:
    return bool(_load_lib())


def _read_numpy(path: str) -> Tuple[np.ndarray, int]:
    import scipy.io.wavfile
    rate, data = scipy.io.wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    return data, rate


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """-> (float32 samples scaled like librosa.load(sr=None), sample_rate)."""
    lib = _load_lib()
    if not lib:
        return _read_numpy(path)
    n = lib.wavio_length(path.encode())
    if n < 0:
        raise IOError(f"cannot read wav: {path}")
    out = np.zeros(n, np.float32)
    rate = ctypes.c_int32(0)
    got = lib.wavio_read(path.encode(),
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         n, ctypes.byref(rate))
    if got < 0:
        raise IOError(f"cannot decode wav: {path}")
    return out[:got], rate.value


def wav_length(path: str) -> int:
    lib = _load_lib()
    if not lib:
        return len(_read_numpy(path)[0])
    n = lib.wavio_length(path.encode())
    if n < 0:
        raise IOError(f"cannot read wav: {path}")
    return n


def read_wav_batch(paths: Sequence[str], max_len: int,
                   n_threads: int = 8) -> Tuple[np.ndarray, np.ndarray,
                                                np.ndarray]:
    """-> (wavs [B, max_len] zero-padded, lengths [B], rates [B])."""
    lib = _load_lib()
    b = len(paths)
    out = np.zeros((b, max_len), np.float32)
    lengths = np.zeros(b, np.int32)
    rates = np.zeros(b, np.int32)
    if lib:
        arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
        lib.wavio_read_batch(
            arr, b, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_len, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rates.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
        bad = np.nonzero(lengths < 0)[0]
        if bad.size:  # match the raising single-file / numpy-fallback paths
            raise IOError("cannot decode wav(s): "
                          + ", ".join(paths[i] for i in bad[:4]))
    else:
        for i, p in enumerate(paths):
            w, r = _read_numpy(p)
            m = min(len(w), max_len)
            out[i, :m] = w[:m]
            lengths[i] = m
            rates[i] = r
    return out, lengths, rates


def write_wav_pcm16(path: str, data: np.ndarray, fs: int = 16000) -> None:
    """PCM16 writer matching soundfile's clipping/rounding.

    int16 input is written as-is (already-quantized samples, e.g. from
    pipeline.pcm16_quantize_i16 fetched off-device at half the transfer
    bytes) — byte-identical to the float path because the device
    quantizer replicates this function's clip/round exactly."""
    if data.dtype == np.int16:
        import scipy.io.wavfile
        scipy.io.wavfile.write(path, fs, np.ascontiguousarray(data))
        return
    lib = _load_lib()
    data = np.ascontiguousarray(data, np.float32)
    if lib:
        n = lib.wavio_write_pcm16(
            path.encode(),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(data), fs)
        if n != len(data):
            raise IOError(f"cannot write wav: {path}")
        return
    import scipy.io.wavfile
    q = np.clip(np.round(data * 32768.0), -32768, 32767).astype(np.int16)
    scipy.io.wavfile.write(path, fs, q)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "build":
        p = build_native(force=True)
        print(p or "build failed")
