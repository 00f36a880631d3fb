"""Multi-device data/tensor parallelism: sharded steps match single-device."""
import numpy as np
import jax
import pytest

from nelegan_tpu.config import Config
from nelegan_tpu.parallel.mesh import (make_mesh, shard_batch, shard_params,
                                       replicate)
from nelegan_tpu.train import gan
from nelegan_tpu import pipeline


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    b, n = 8, 8192
    clean, lens = pipeline.reflect_pad_batch(
        [(0.03 * rng.randn(n)).astype(np.float32) for _ in range(b)])
    noise, _ = pipeline.reflect_pad_batch(
        [(0.03 * rng.randn(n)).astype(np.float32) for _ in range(b)])
    return clean, noise, lens


def test_dp_g_step_matches_single(batch):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    clean, noise, lens = batch
    cfg = Config()
    cb, nb, fr = gan.featurize_bands(clean, noise, lens, cfg)
    cb, nb, fr = map(np.asarray, (cb, nb, fr))

    state0 = gan.init_train_state(jax.random.PRNGKey(0), cfg)
    _, loss_single = gan.g_step_bands(state0, cb, nb, fr, cfg)

    mesh = make_mesh(8, model_parallel=1)
    state_r = replicate(mesh, state0)
    cb_s, nb_s, fr_s = shard_batch(mesh, (cb, nb, fr))
    state1, loss_dp = gan.g_step_bands(state_r, cb_s, nb_s, fr_s, cfg)
    np.testing.assert_allclose(float(loss_dp), float(loss_single),
                               rtol=1e-5)
    # the sharded update equals the single-device update
    w0 = np.asarray(gan.g_step_bands(state0, cb, nb, fr,
                                     cfg)[0].gen_params["fc1"]["kernel"])
    w1 = np.asarray(state1.gen_params["fc1"]["kernel"])
    np.testing.assert_allclose(w1, w0, rtol=1e-4, atol=1e-6)


def test_dp_tp_d_step(batch):
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    clean, noise, lens = batch
    cfg = Config()
    img3, img2, frames = gan.featurize_triple(clean, noise, clean, lens, cfg)
    img3, img2, frames = map(np.asarray, (img3, img2, frames))
    t3 = np.full((8, 3), 0.7, np.float32)
    t2 = np.full((8, 2), 0.7, np.float32)

    state0 = gan.init_train_state(jax.random.PRNGKey(0), cfg)
    _, ld0, lq0 = gan.d_step(state0, img3, img2, frames, t3, t2, cfg)

    mesh = make_mesh(8, model_parallel=2)
    state_r = state0._replace(
        d_params=shard_params(mesh, state0.d_params),
        d_opt=shard_params(mesh, state0.d_opt),
        dq_params=shard_params(mesh, state0.dq_params),
        dq_opt=shard_params(mesh, state0.dq_opt),
        gen_params=replicate(mesh, state0.gen_params),
        gen_opt=replicate(mesh, state0.gen_opt),
        d_spectral=replicate(mesh, state0.d_spectral),
        dq_spectral=replicate(mesh, state0.dq_spectral))
    args_s = shard_batch(mesh, (img3, img2, frames, t3, t2))
    _, ld1, lq1 = gan.d_step(state_r, *args_s, cfg)
    np.testing.assert_allclose(float(ld1), float(ld0), rtol=1e-5)
    np.testing.assert_allclose(float(lq1), float(lq0), rtol=1e-5)


def test_score_corpus_sharded_matches_single():
    """Mesh-sharded corpus scoring equals unsharded scoring utterance-wise
    (utterances are independent; GSPMD should insert zero collectives)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import scipy.io.wavfile as wavfile
    from nelegan_tpu.metrics import score_corpus
    _, c = wavfile.read(
        "/root/reference/toy_dataset/Train/Clean/f_hvd_100#Babble#-11.wav")
    _, n = wavfile.read(
        "/root/reference/toy_dataset/Train/Noise/f_hvd_100#Babble#-11.wav")
    clean = (c / 32768.0).astype(np.float32)
    noise = (n / 32768.0).astype(np.float32)
    rng = np.random.RandomState(1)
    # 5 short utterances (deliberately not a multiple of the data axis) of
    # different lengths and degradations; SIIB is exercised unsharded
    # elsewhere (its 20 s tiling is too heavy for the virtual CPU mesh)
    cleans, noises, enhs = [], [], []
    for i in range(5):
        m = 12000 - 1000 * i
        cleans.append(clean[:m])
        noises.append(noise[:m])
        enhs.append(clean[:m] + 0.1 * i * noise[:m]
                    + 0.01 * rng.randn(m).astype(np.float32))
    metrics = ("estoi", "pesq", "visqol", "haspi")
    single = score_corpus(cleans, noises, enhs, norm=False, metrics=metrics,
                          bucket_quant=4096)
    mesh = make_mesh(8, model_parallel=1)
    sharded = score_corpus(cleans, noises, enhs, norm=False, metrics=metrics,
                           mesh=mesh, vmap_chunk=1, bucket_quant=4096)
    for s, h in zip(single, sharded):
        for k in metrics:
            assert abs(s[k] - h[k]) <= 1e-3 * max(1.0, abs(s[k])), (k, s, h)


def test_score_corpus_sharded_with_clean_cache():
    """The chunk-keyed clean-side cache composes with mesh sharding: warm
    rescoring is bit-stable and matches the uncached sharded path."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import scipy.io.wavfile as wavfile
    from nelegan_tpu.metrics import score_corpus
    from nelegan_tpu.utils.lru import LRUCache
    _, c = wavfile.read(
        "/root/reference/toy_dataset/Train/Clean/f_hvd_100#Babble#-11.wav")
    _, n = wavfile.read(
        "/root/reference/toy_dataset/Train/Noise/f_hvd_100#Babble#-11.wav")
    clean = (c / 32768.0).astype(np.float32)
    noise = (n / 32768.0).astype(np.float32)
    cleans = [clean[:12000] * (0.9 + 0.02 * i) for i in range(4)]
    noises = [noise[:12000] * 0.3] * 4
    enhs = [cl * 0.9 for cl in cleans]
    keys = [f"u{i}" for i in range(4)]
    metrics = ("estoi", "haspi")
    mesh = make_mesh(8, model_parallel=1)
    cache = LRUCache(16)
    cold = score_corpus(cleans, noises, enhs, norm=False, metrics=metrics,
                        mesh=mesh, vmap_chunk=1, bucket_quant=4096,
                        clean_cache=cache, clean_keys=keys)
    assert len(cache) >= 2
    warm = score_corpus(cleans, noises, enhs, norm=False, metrics=metrics,
                        mesh=mesh, vmap_chunk=1, bucket_quant=4096,
                        clean_cache=cache, clean_keys=keys)
    plain = score_corpus(cleans, noises, enhs, norm=False, metrics=metrics,
                         mesh=mesh, vmap_chunk=1, bucket_quant=4096)
    for a, b, d in zip(cold, warm, plain):
        for k in metrics:
            assert abs(a[k] - b[k]) < 1e-6, (k, a, b)
            assert abs(a[k] - d[k]) <= 2e-3 * max(1.0, abs(d[k])), (k, a, d)


def test_pool_mesh_hits_survive_reshuffle():
    """The per-utterance CleanSidePool composes with mesh-sharded scoring:
    a warm call with the SAME utterances in a DIFFERENT order (different
    chunk row order — the per-epoch shuffled training sample) invokes ZERO
    clean-side recomputes and reproduces the scores per utterance.  The
    chunk-keyed fallback this replaces missed every reshuffled chunk
    (round-2 VERDICT item 6)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import scipy.io.wavfile as wavfile
    from nelegan_tpu.metrics import score_corpus
    from nelegan_tpu.metrics.clean_pool import CleanSidePool

    class CountingPool(CleanSidePool):
        computes = 0

        def ensure(self, sig, keys, compute, mesh=None):
            def counting():
                CountingPool.computes += 1
                return compute()
            return super().ensure(sig, keys, counting, mesh=mesh)

    _, c = wavfile.read(
        "/root/reference/toy_dataset/Train/Clean/f_hvd_100#Babble#-11.wav")
    _, n = wavfile.read(
        "/root/reference/toy_dataset/Train/Noise/f_hvd_100#Babble#-11.wav")
    clean = (c / 32768.0).astype(np.float32)
    noise = (n / 32768.0).astype(np.float32)
    cleans = [clean[:10000] * (0.9 + 0.02 * i) for i in range(8)]
    noises = [noise[:10000] * (0.25 + 0.02 * i) for i in range(8)]
    enhs = [cl * (0.85 + 0.02 * i) for i, cl in enumerate(cleans)]
    keys = [f"u{i}" for i in range(8)]
    metrics = ("estoi", "haspi")
    mesh = make_mesh(8, model_parallel=1)
    pool = CountingPool()

    cold = score_corpus(cleans, noises, enhs, norm=False, metrics=metrics,
                        mesh=mesh, vmap_chunk=1, bucket_quant=4096,
                        clean_cache=pool, clean_keys=keys)
    n_cold = CountingPool.computes
    assert n_cold > 0

    perm = [3, 7, 0, 5, 1, 6, 2, 4]
    warm = score_corpus([cleans[i] for i in perm],
                        [noises[i] for i in perm],
                        [enhs[i] for i in perm],
                        norm=False, metrics=metrics, mesh=mesh,
                        vmap_chunk=1, bucket_quant=4096,
                        clean_cache=pool, clean_keys=[keys[i] for i in perm])
    assert CountingPool.computes == n_cold  # zero clean-side recomputes
    for j, i in enumerate(perm):
        for k in metrics:
            assert abs(cold[i][k] - warm[j][k]) < 1e-5, (k, i, cold[i],
                                                         warm[j])
