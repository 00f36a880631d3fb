"""utils.transfer.fetch_pytree: batched device->host pytree copy."""
import jax
import jax.numpy as jnp
import numpy as np

from nelegan_tpu.utils.transfer import fetch_pytree


def test_fetch_pytree_round_trip():
    rng = np.random.RandomState(0)
    tree = {
        "a": jnp.asarray(rng.randn(3, 5).astype(np.float32)),
        "b": [jnp.asarray(rng.randn(7).astype(np.float32)),
              jnp.asarray(np.arange(4, dtype=np.int32))],
        "c": {"k": jnp.asarray(rng.randn(2, 2, 2))},     # f64 on CPU tests
        "np_passthrough": np.ones(3),
        "scalar": 1.5,
        "empty": jnp.zeros((0, 4), jnp.float32),
    }
    out = fetch_pytree(tree)
    assert isinstance(out["a"], np.ndarray) and out["a"].shape == (3, 5)
    np.testing.assert_array_equal(out["a"], np.asarray(tree["a"]))
    np.testing.assert_array_equal(out["b"][0], np.asarray(tree["b"][0]))
    np.testing.assert_array_equal(out["b"][1], np.asarray(tree["b"][1]))
    assert out["b"][1].dtype == np.int32
    np.testing.assert_array_equal(out["c"]["k"], np.asarray(tree["c"]["k"]))
    assert out["np_passthrough"] is tree["np_passthrough"]
    assert out["scalar"] == 1.5
    assert out["empty"].shape == (0, 4)


def test_fetch_pytree_matches_device_get_on_train_state():
    from nelegan_tpu.config import Config
    from nelegan_tpu.train import gan
    state = gan.init_train_state(jax.random.PRNGKey(0), Config())
    fast = fetch_pytree(state._asdict())
    slow = jax.device_get(state._asdict())
    flat_f, _ = jax.tree_util.tree_flatten(fast)
    flat_s, _ = jax.tree_util.tree_flatten(slow)
    assert len(flat_f) == len(flat_s)
    for a, b in zip(flat_f, flat_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
