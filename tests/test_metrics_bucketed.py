"""Bucketed (padded + n_valid) scoring agrees with exact-length scoring."""
import numpy as np
import pytest

# compiles every metric at several (bucket, exact) shape pairs in f64 —
# many-core suite material, not for 1-core driver hosts
pytestmark = pytest.mark.heavy
import scipy.io.wavfile as wavfile

from nelegan_tpu.metrics import score_pair, score_corpus


@pytest.fixture(scope="module")
def triples():
    _, c = wavfile.read(
        "/root/reference/toy_dataset/Train/Clean/f_hvd_100#Babble#-11.wav")
    _, n = wavfile.read(
        "/root/reference/toy_dataset/Train/Noise/f_hvd_100#Babble#-11.wav")
    clean = (c / 32768.0).astype(np.float64)
    noise = (n / 32768.0).astype(np.float64)
    out = []
    for ln, g in [(20000, 0.3), (33536, 1.0), (28111, 0.1)]:
        out.append((clean[:ln], g * noise[:ln], clean[:ln] * 0.9))
    return out


def test_bucketed_matches_exact(triples):
    metrics = ("estoi", "pesq", "visqol", "haspi")
    exact = [score_pair(c, n, e, norm=False, metrics=metrics)
             for c, n, e in triples]
    bucketed = score_corpus([t[0] for t in triples],
                            [t[1] for t in triples],
                            [t[2] for t in triples],
                            norm=False, metrics=metrics)
    for ex, bu in zip(exact, bucketed):
        for m in metrics:
            # HASPI's padded run uses a different FFT length and carries
            # tail segments through threshold gates -> ~0.3% residual
            tol = 5e-3 if m == "haspi" else 1e-3
            assert abs(ex[m] - bu[m]) < tol * max(abs(ex[m]), 1.0), (
                m, ex[m], bu[m])


def test_bucketed_siib_close(triples):
    # SIIB's KLT makes padded-vs-exact agreement looser (the stacked-frame
    # covariance sees the compacted valid region only; residual differences
    # come from f32 eigendecomposition sensitivity)
    exact = [score_pair(c, n, e, norm=False, metrics=("siib",))
             for c, n, e in triples]
    bucketed = score_corpus([t[0] for t in triples],
                            [t[1] for t in triples],
                            [t[2] for t in triples],
                            norm=False, metrics=("siib",))
    for ex, bu in zip(exact, bucketed):
        assert abs(ex["siib"] - bu["siib"]) < 0.05 * max(ex["siib"], 10.0), (
            ex["siib"], bu["siib"])


def test_siib_klt_cache_matches(triples):
    """The cross-epoch KLT cache path (siib_gauss_16k_with_klt) must agree
    with the direct eigh-per-score path, on both cold and warm epochs."""
    cleans = [t[0] for t in triples]
    noises = [t[1] for t in triples]
    enhs = [t[2] for t in triples]
    keys = [f"utt{i}" for i in range(len(triples))]

    direct = score_corpus(cleans, noises, enhs, norm=False,
                          metrics=("siib",))
    cache: dict = {}
    cold = score_corpus(cleans, noises, enhs, norm=False, metrics=("siib",),
                        clean_cache=cache, clean_keys=keys)
    assert len(cache) >= 1  # one stacked KLT entry per scored chunk
    # warm epoch: different enhanced signals, cached clean-side KLT
    enhs2 = [e * 0.8 + 0.02 * n for e, n in zip(enhs, noises)]
    warm = score_corpus(cleans, noises, enhs2, norm=False, metrics=("siib",),
                        clean_cache=cache, clean_keys=keys)
    warm_direct = score_corpus(cleans, noises, enhs2, norm=False,
                               metrics=("siib",))
    for a, b in zip(direct, cold):
        assert abs(a["siib"] - b["siib"]) < 1e-3 * max(a["siib"], 10.0)
    for a, b in zip(warm_direct, warm):
        # warm path reuses the f32 eigenbasis; eigh sensitivity bounds this
        assert abs(a["siib"] - b["siib"]) < 0.02 * max(a["siib"], 10.0), (
            a["siib"], b["siib"])


def test_clean_cache_keys_on_valid_length(triples):
    """Same clean utterances but shorter enhanced files (different nv) must
    not hit stale clean-side entries — the key includes per-row nv."""
    from nelegan_tpu.utils.lru import LRUCache
    cleans = [t[0] for t in triples]
    noises = [t[1] for t in triples]
    enhs = [t[2] for t in triples]
    keys = [f"utt{i}" for i in range(len(triples))]
    cache = LRUCache(max_entries=64)
    score_corpus(cleans, noises, enhs, norm=False,
                 metrics=("siib", "haspi"), clean_cache=cache,
                 clean_keys=keys)
    n0 = len(cache)
    # trim 3000 samples: same bucket, different valid length
    enhs_cut = [e[:-3000] for e in enhs]
    cut = score_corpus(cleans, noises, enhs_cut, norm=False,
                       metrics=("siib", "haspi"), clean_cache=cache,
                       clean_keys=keys)
    assert len(cache) > n0  # new entries, not stale hits
    direct = score_corpus(cleans, noises, enhs_cut, norm=False,
                          metrics=("siib", "haspi"))
    for a, b in zip(direct, cut):
        assert abs(a["haspi"] - b["haspi"]) < 2e-3 * max(abs(a["haspi"]), 1.0)
        assert abs(a["siib"] - b["siib"]) < 1e-3 * max(a["siib"], 10.0)
    # LRU bound holds under churn
    for i in range(10):
        score_corpus(cleans, noises, [e[:-100 * (i + 1)] for e in enhs],
                     norm=False, metrics=("siib",), clean_cache=cache,
                     clean_keys=keys)
    assert len(cache) <= 64


def test_clean_pool_hits_reshuffled_chunks(triples):
    """CleanSidePool caches per utterance, so scores must match the direct
    path even when the corpus is rescored in a different order (per-epoch
    shuffled sampling) and with changed enhanced signals."""
    from nelegan_tpu.metrics.clean_pool import CleanSidePool
    cleans = [t[0] for t in triples]
    noises = [t[1] for t in triples]
    enhs = [t[2] for t in triples]
    keys = [f"utt{i}" for i in range(len(triples))]
    pool = CleanSidePool(max_rows_per_shape=8)
    score_corpus(cleans, noises, enhs, norm=False,
                 metrics=("siib", "haspi", "estoi"),
                 clean_cache=pool, clean_keys=keys)
    n_resident = len(pool)
    assert n_resident >= len(triples)
    # "next epoch": same utterances, reversed order, new enhanced signals
    order = list(reversed(range(len(triples))))
    enhs2 = [0.85 * enhs[i] + 0.01 * noises[i] for i in order]
    warm = score_corpus([cleans[i] for i in order],
                        [noises[i] for i in order], enhs2,
                        norm=False, metrics=("siib", "haspi", "estoi"),
                        clean_cache=pool, clean_keys=[keys[i] for i in order])
    assert len(pool) == n_resident  # pure hits, nothing recomputed
    direct = score_corpus([cleans[i] for i in order],
                          [noises[i] for i in order], enhs2,
                          norm=False, metrics=("siib", "haspi", "estoi"))
    for a, b in zip(direct, warm):
        assert abs(a["haspi"] - b["haspi"]) < 2e-3 * max(abs(a["haspi"]), 1.0)
        assert abs(a["siib"] - b["siib"]) < 0.02 * max(a["siib"], 10.0)
        assert abs(a["estoi"] - b["estoi"]) < 1e-5  # bit-identical half


def test_haspi_clean_cache_matches(triples):
    """The split clean/degraded HASPI path must agree with the pair path,
    cold and warm (the single-side ear model is bit-identical math)."""
    cleans = [t[0] for t in triples]
    noises = [t[1] for t in triples]
    enhs = [t[2] for t in triples]
    keys = [f"utt{i}" for i in range(len(triples))]

    direct = score_corpus(cleans, noises, enhs, norm=False,
                          metrics=("haspi",))
    cache: dict = {}
    cold = score_corpus(cleans, noises, enhs, norm=False, metrics=("haspi",),
                        clean_cache=cache, clean_keys=keys)
    enhs2 = [e * 0.8 + 0.02 * n for e, n in zip(enhs, noises)]
    warm = score_corpus(cleans, noises, enhs2, norm=False,
                        metrics=("haspi",), clean_cache=cache,
                        clean_keys=keys)
    warm_direct = score_corpus(cleans, noises, enhs2, norm=False,
                               metrics=("haspi",))
    for a, b in zip(direct + warm_direct, cold + warm):
        assert abs(a["haspi"] - b["haspi"]) < 2e-3 * max(abs(a["haspi"]),
                                                         1.0), (a, b)


def _pcm16(x):
    return np.round(np.clip(x, -1, 1) * 32768.0).clip(-32768, 32767) / 32768.0


def test_raw_signal_pool_and_pcm16_uploads_match(triples):
    """The raw-signal device pool (pool_raw_signals) and the int16 PCM
    transfer path must not change any score: warm pooled calls — which
    upload only the enhanced signal and gather clean/noise rows from the
    pool — must equal unpooled f32 scoring exactly, and a changed enhanced
    signal must change the scores (the pool must never cache it)."""
    from nelegan_tpu.metrics.clean_pool import CleanSidePool
    metrics = ("estoi", "siib", "pesq")
    # PCM16-exact signals, like every file the training loop scores
    cleans = [_pcm16(t[0]).astype(np.float32) for t in triples]
    noises = [_pcm16(t[1]).astype(np.float32) for t in triples]
    enhs = [_pcm16(t[2]).astype(np.float32) for t in triples]
    keys = [f"u{i}" for i in range(len(cleans))]

    base = score_corpus(cleans, noises, enhs, norm=False, metrics=metrics,
                        pool_raw_signals=False)
    pool = CleanSidePool()
    cold = score_corpus(cleans, noises, enhs, norm=False, metrics=metrics,
                        clean_cache=pool, clean_keys=keys)
    warm = score_corpus(cleans, noises, enhs, norm=False, metrics=metrics,
                        clean_cache=pool, clean_keys=keys)
    for b, c, w in zip(base, cold, warm):
        for m in metrics:
            assert np.isclose(b[m], c[m], rtol=1e-6, atol=1e-7), (m, b, c)
            assert c[m] == w[m], (m, c, w)  # warm gather is bit-stable

    # a new enhanced signal through the warm pool must change scores
    enhs2 = [_pcm16(t[2] * 0.5 + 0.01 * t[1]).astype(np.float32)
             for t in triples]
    warm2 = score_corpus(cleans, noises, enhs2, norm=False, metrics=metrics,
                         clean_cache=pool, clean_keys=keys)
    assert any(w2[m] != w[m] for w2, w in zip(warm2, warm)
               for m in metrics)


def test_non_pcm16_floats_fall_back_exactly(triples):
    """Arbitrary float signals (not PCM16 round trips) must skip the int16
    packing and still score identically with and without the pool."""
    from nelegan_tpu.metrics.clean_pool import CleanSidePool
    from nelegan_tpu.metrics import _pcm16_exact
    metrics = ("estoi",)
    cleans = [t[0] * 0.77701 for t in triples]   # breaks integrality
    noises = [t[1] * 1.0301 for t in triples]
    enhs = [t[2] * 0.9137 for t in triples]
    assert not _pcm16_exact(cleans[0])
    base = score_corpus(cleans, noises, enhs, norm=False, metrics=metrics,
                        pool_raw_signals=False)
    pool = CleanSidePool()
    score_corpus(cleans, noises, enhs, norm=False, metrics=metrics,
                 clean_cache=pool, clean_keys=["a", "b", "c"])
    warm = score_corpus(cleans, noises, enhs, norm=False, metrics=metrics,
                        clean_cache=pool, clean_keys=["a", "b", "c"])
    for b, w in zip(base, warm):
        assert np.isclose(b["estoi"], w["estoi"], rtol=1e-6), (b, w)


def test_chunk_keyed_raw_signal_cache_matches(triples):
    """The chunk-keyed raw-signal cache (dict-like clean_cache — the
    mesh-sharded form) must skip the clean/noise upload on repeat calls
    with fixed chunk composition without changing any score, and must
    still see a changed enhanced signal."""
    metrics = ("estoi", "siib")
    cleans = [_pcm16(t[0]).astype(np.float32) for t in triples]
    noises = [_pcm16(t[1]).astype(np.float32) for t in triples]
    enhs = [_pcm16(t[2]).astype(np.float32) for t in triples]
    keys = ["a", "b", "c"]
    base = score_corpus(cleans, noises, enhs, norm=False, metrics=metrics,
                        pool_raw_signals=False)
    cache = {}
    cold = score_corpus(cleans, noises, enhs, norm=False, metrics=metrics,
                        clean_cache=cache, clean_keys=keys)
    assert any(isinstance(k, tuple) and k[0] == "raw-signals"
               for k in cache)
    warm = score_corpus(cleans, noises, enhs, norm=False, metrics=metrics,
                        clean_cache=cache, clean_keys=keys)
    for b, c, w in zip(base, cold, warm):
        for m in metrics:
            assert np.isclose(b[m], c[m], rtol=1e-6), (m, b, c)
            assert c[m] == w[m], (m, c, w)
    enhs2 = [e * np.float32(0.5) for e in enhs]
    warm2 = score_corpus(cleans, noises, enhs2, norm=False, metrics=metrics,
                         clean_cache=cache, clean_keys=keys)
    assert any(w2[m] != w[m] for w2, w in zip(warm2, warm) for m in metrics)


def test_pool_row_cap_lifts_for_pinned_chunks():
    """A fused scan chunk may pin more rows than max_rows_per_shape; the
    cap lifts to fit one full chunk instead of raising mid-epoch
    (clean_pool._row_cap; ADVICE r3)."""
    import jax.numpy as jnp
    from nelegan_tpu.metrics.clean_pool import CleanSidePool

    pool = CleanSidePool(max_rows_per_shape=4)
    keys = [f"u{i}" for i in range(10)]  # one chunk pins 10 > 4 rows

    def compute():
        return jnp.arange(10, dtype=jnp.float32)[:, None] * jnp.ones((10, 3))

    pl, rows = pool.ensure_rows("sig", keys, compute)
    assert len(set(rows)) == 10  # all distinct, no forced eviction
    got = np.asarray(pool.gather_rows("sig", rows))
    np.testing.assert_array_equal(got[:, 0], np.arange(10, dtype=np.float32))

    # a second chunk with NEW keys while the first chunk's rows stay
    # pinned (a still-pending fused program) must not evict or fail
    keys2 = [f"v{i}" for i in range(3)]

    def compute2():
        return 100.0 + jnp.arange(3, dtype=jnp.float32)[:, None] \
            * jnp.ones((3, 3))

    _, rows2 = pool.ensure_rows("sig", keys2, compute2,
                                pinned_rows=set(rows))
    assert not set(rows2) & set(rows)
    got1 = np.asarray(pool.gather_rows("sig", rows))
    np.testing.assert_array_equal(got1[:, 0],
                                  np.arange(10, dtype=np.float32))
