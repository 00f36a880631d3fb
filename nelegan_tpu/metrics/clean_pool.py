"""Per-utterance on-device pool for clean-side metric halves.

score_corpus caches the clean-side computations of SIIB (KLT basis),
HASPI v2 (clean ear model + envelope) and ESTOI (normalised segments).  A
chunk-keyed dict only hits when a whole chunk repeats with identical
composition — true for the fixed validation corpus, never true for the
per-epoch *shuffled* training sample (train/loop.py run_epoch), whose
utterances all repeat but in different chunk groupings.

This pool stores entries PER UTTERANCE inside one device array per entry
shape and rebuilds any chunk with a single batched gather (pool[rows]) —
one device dispatch, unlike stacking N separately cached arrays (N
gathers through the remote-device tunnel, measured slower than
recomputing).  Misses recompute the whole chunk and write it back with a
single scatter (pool.at[rows].set(vals)).

Capacity grows geometrically from the first chunk's size up to
`max_rows_per_shape` (no eager multi-GB zero allocation); at the cap,
least-recently-used rows are evicted and their slots reused, so long runs
with many distinct (utterance, valid-length) keys cannot grow HBM without
bound.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable, Hashable, List, Sequence


class CleanSidePool:
    """ensure(sig, keys, compute) -> stacked values for one scoring chunk.

    sig:  hashable shape signature (metric name + bucket dims); each sig
          gets its own pool array (a pytree with leading capacity axis).
    keys: one hashable key per chunk row (utterance id + valid length).
    compute: () -> stacked pytree [len(keys), ...] for a full recompute.
    """

    def __init__(self, max_rows_per_shape: int = 768):
        assert max_rows_per_shape > 0
        self.max_rows = max_rows_per_shape
        # sig -> {"pool": pytree [cap, ...] | None, "cap": int,
        #         "map": OrderedDict key -> row (LRU order),
        #         "next": int high-water mark}
        self._shapes: dict = {}

    def _state(self, sig: Hashable) -> dict:
        if sig not in self._shapes:
            self._shapes[sig] = {"pool": None, "cap": 0,
                                 "map": OrderedDict(), "next": 0}
        return self._shapes[sig]

    def _alloc_row(self, st: dict, pinned: set) -> int:
        if st["next"] < self.max_rows:
            st["next"] += 1
            return st["next"] - 1
        for k in st["map"]:  # iterate LRU -> MRU
            if st["map"][k] not in pinned:
                return st["map"].pop(k)
        raise RuntimeError(
            f"CleanSidePool: max_rows_per_shape={self.max_rows} all pinned "
            f"by one chunk — raise the bound above the chunk width")

    def _grow_to(self, st: dict, needed: int, proto) -> None:
        """Geometric capacity growth, bounded by max_rows."""
        import jax
        import jax.numpy as jnp
        cap = st["cap"]
        if needed <= cap:
            return
        new_cap = max(cap, 1)
        while new_cap < needed:
            new_cap *= 2
        new_cap = min(new_cap, self.max_rows)

        def alloc(p, v):
            z = jnp.zeros((new_cap,) + v.shape[1:], v.dtype)
            return z if p is None else z.at[:cap].set(p)

        if st["pool"] is None:
            st["pool"] = jax.tree_util.tree_map(
                lambda v: alloc(None, v), proto)
        else:
            st["pool"] = jax.tree_util.tree_map(alloc, st["pool"], proto)
        st["cap"] = new_cap

    def ensure(self, sig: Hashable, keys: Sequence[Hashable],
               compute: Callable[[], Any]) -> Any:
        import jax
        import jax.numpy as jnp

        st = self._state(sig)
        rows = [st["map"].get(k) for k in keys]
        if st["pool"] is not None and all(r is not None for r in rows):
            for k in keys:                       # refresh LRU order
                st["map"].move_to_end(k)
            idx = jnp.asarray(rows, jnp.int32)
            return jax.tree_util.tree_map(lambda p: p[idx], st["pool"])

        vals = compute()                         # stacked [B, ...] pytree
        # insert every key this chunk computed (first occurrence wins —
        # padded rows repeat a key with identical values)
        pinned = {r for r in rows if r is not None}
        first_j: dict = {}
        for j, k in enumerate(keys):
            first_j.setdefault(k, j)
        need = [k for k in first_j if k not in st["map"]]
        dest: List[int] = []
        for k in need:
            r = self._alloc_row(st, pinned)
            st["map"][k] = r
            pinned.add(r)
            dest.append(r)
        for k in keys:
            st["map"].move_to_end(k)
        if dest:
            self._grow_to(st, max(dest) + 1, vals)
            didx = jnp.asarray(dest, jnp.int32)
            tidx = jnp.asarray([first_j[k] for k in need], jnp.int32)
            st["pool"] = jax.tree_util.tree_map(
                lambda p, v: p.at[didx].set(v[tidx]), st["pool"], vals)
        return vals

    def __len__(self) -> int:
        return sum(len(st["map"]) for st in self._shapes.values())

    def clear(self) -> None:
        self._shapes.clear()
