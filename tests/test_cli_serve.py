"""Serving daemon: protocol, dynamic batching, and batch/single parity."""
import threading

import numpy as np
import pytest

from nelegan_tpu.data.wavio import read_wav

TOY_CLEAN = "/root/reference/toy_dataset/Train/Clean/f_hvd_100#Babble#-11.wav"
TOY_NOISE = "/root/reference/toy_dataset/Train/Noise/f_hvd_100#Babble#-11.wav"


@pytest.fixture(scope="module")
def server():
    import jax
    from nelegan_tpu.cli.serve import EnhanceServer
    from nelegan_tpu.models.generator import Generator

    params = Generator().init(
        jax.random.PRNGKey(0), np.zeros((1, 8, 64), np.float32),
        np.zeros((1, 8, 64), np.float32))["params"]
    srv = EnhanceServer(params, batch_size=4, max_wait_ms=50.0)
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=("127.0.0.1", 0, ready),
                         daemon=True)
    t.start()
    assert ready.wait(timeout=120), "server did not come up"
    yield srv
    srv.stop()


def test_serve_matches_direct_pipeline(server):
    from nelegan_tpu import pipeline
    from nelegan_tpu.cli.serve import enhance_remote

    clean, sr = read_wav(TOY_CLEAN)
    noise, _ = read_wav(TOY_NOISE)
    assert sr == 16000
    got = enhance_remote(*server.address, clean, noise, timeout=300.0)
    assert got.shape == clean.shape

    want = np.asarray(pipeline.enhance_utterance(server.params, clean,
                                                 noise))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    # exact output RMS contract (reference: inference.py:109)
    assert abs(float(np.sqrt(np.mean(got ** 2))) - 0.03) < 1e-6


def test_serve_batches_concurrent_requests(server):
    from nelegan_tpu.cli.serve import enhance_remote

    clean, _ = read_wav(TOY_CLEAN)
    noise, _ = read_wav(TOY_NOISE)
    scales = [0.8, 0.9, 1.0, 1.1]
    before = dict(server.stats)
    results = [None] * len(scales)

    def one(i):
        results[i] = enhance_remote(*server.address, clean * scales[i],
                                    noise, timeout=300.0)

    threads = [threading.Thread(target=one, args=(i,))
               for i in range(len(scales))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert all(r is not None and r.size == clean.size for r in results)
    served = server.stats["requests"] - before["requests"]
    batches = server.stats["batches"] - before["batches"]
    assert served == len(scales)
    # 4 concurrent same-bucket requests with a 50 ms window must coalesce
    # into fewer than 4 device batches
    assert batches < len(scales)
    # different inputs -> different outputs (requests were not crossed)
    assert np.abs(results[0] - results[3]).max() > 0


def test_serve_rejects_bad_magic(server):
    import socket
    import struct
    with socket.create_connection(server.address, timeout=30) as s:
        s.sendall(b"XXXX\x01")
        (code,) = struct.unpack("<I", s.recv(4))
        assert code == 0xFFFFFFFF


def test_serve_rejects_empty_signal(server):
    import socket
    import struct
    from nelegan_tpu.cli.serve import MAGIC, VERSION, _send_f32
    with socket.create_connection(server.address, timeout=30) as s:
        s.sendall(MAGIC + struct.pack("<B", VERSION))
        _send_f32(s, np.zeros(0, np.float32))
        _send_f32(s, np.zeros(16, np.float32))
        (code,) = struct.unpack("<I", s.recv(4))
        assert code == 0xFFFFFFFF
