"""Batched device->host pytree transfer.

Naively serializing a training state (flax.serialization, jax.device_get)
fetches every leaf separately — one device round trip each.  Through the
remote-device tunnel used here (~30 ms RTT), a ~250-leaf train state costs
~8 s per checkpoint that way (measured; it dominated the epoch).
`fetch_pytree` instead packs all same-dtype leaves into one flat device
buffer inside a single jitted program and fetches O(dtypes) arrays, then
splits them on host — two or three round trips total.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _pack(leaves):
    """Concatenate raveled same-dtype leaves into one flat buffer.
    jit cache keys on the list's shapes/dtypes — stable across epochs."""
    if len(leaves) == 1:
        return leaves[0].ravel()
    return jnp.concatenate([l.ravel() for l in leaves])


def fetch_pytree(tree):
    """Device->host copy of a pytree in O(distinct dtypes) transfers.

    Non-JAX leaves (numpy arrays, python scalars) pass through unchanged.
    Returns a pytree of numpy arrays with the original shapes/dtypes.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = list(leaves)
    groups: dict = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array):
            groups.setdefault(jnp.dtype(leaf.dtype), []).append(i)
    for dt, idxs in groups.items():
        host = np.asarray(_pack([leaves[i] for i in idxs]))
        off = 0
        for i in idxs:
            n = int(np.prod(leaves[i].shape, dtype=np.int64))
            out[i] = host[off:off + n].reshape(leaves[i].shape)
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)
