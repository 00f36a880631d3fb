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
`max_rows_per_shape` per shape signature AND `max_bytes` summed across all
signatures (a corpus spanning many bucket lengths allocates one pool per
(metric, bucket) pair — without the global bound, the per-shape cap would
multiply); at either cap, least-recently-used rows are evicted and their
slots reused, so long runs with many distinct (utterance, valid-length)
keys cannot grow HBM without bound.  `resident_bytes` reports the current
total.
"""
from __future__ import annotations

import functools
from collections import OrderedDict
from typing import Any, Callable, Hashable, List, Sequence


@functools.lru_cache(maxsize=None)
def _jit_gather(mesh=None, data_axis: str = "data"):
    """One jitted program gathering every pool leaf at once.  Op-by-op
    `leaf[idx]` costs ~3 ms of dispatch per leaf through the remote-device
    tunnel (measured: a 4-leaf hit 12.5 ms raw vs 0.66 ms as one jitted
    call); jit retraces only when the pool capacity grows (powers of two,
    then stable).

    With a mesh, the pool arrays are REPLICATED (parameter-like layout)
    and the gathered chunk comes out sharded over the data axis — each
    device slices its own rows locally, zero collectives — so pool hits
    compose with mesh-sharded (SPMD) metric programs."""
    import jax
    fn = lambda pool, idx: jax.tree_util.tree_map(lambda p: p[idx], pool)
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.jit(fn, out_shardings=NamedSharding(mesh, P(data_axis)))


@functools.lru_cache(maxsize=None)
def _jit_scatter(mesh=None):
    """Jitted row insert: one dispatch for all leaves (same rationale as
    _jit_gather).  Tried and rejected: donate_argnums=(0,) to update the
    pool in place — later reads of the donated-aliased output segfaulted
    the process on the CPU backend (heap corruption surfacing at random
    sites: clean_pool._grow_to, jax's compilation-cache writer).  The
    copy per insert is the safe price; inserts are rare after warm-up.

    With a mesh, the incoming values are data-sharded and the pool is
    replicated, so this program all-gathers the new rows (the one
    collective on the pool path; inserts are rare after warm-up)."""
    import jax
    fn = lambda pool, vals, didx, tidx: jax.tree_util.tree_map(
        lambda p, v: p.at[didx].set(v[tidx]), pool, vals)
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.jit(fn, out_shardings=NamedSharding(mesh, P()))


class CleanSidePool:
    """ensure(sig, keys, compute) -> stacked values for one scoring chunk.

    sig:  hashable shape signature (metric name + bucket dims); each sig
          gets its own pool array (a pytree with leading capacity axis).
    keys: one hashable key per chunk row (utterance id + valid length).
    compute: () -> stacked pytree [len(keys), ...] for a full recompute.
    """

    def __init__(self, max_rows_per_shape: int = 768,
                 max_bytes: int = 2 << 30):
        assert max_rows_per_shape > 0
        self.max_rows = max_rows_per_shape
        self.max_bytes = max_bytes
        self.resident_bytes = 0
        # chunk-level hit accounting: `hits` chunks served entirely from
        # the pool (one device gather, zero host reads/uploads), `misses`
        # chunks that ran compute().  Warm-epoch parity between the dp and
        # single-chip Trainer paths is asserted on these counters
        # (tests/test_parallel_epoch.py)
        self.hits = 0
        self.misses = 0
        # mesh-sharded score_corpus can't use arbitrary-row gathers; it
        # degrades to this chunk-keyed LRU instead of dropping caching
        from nelegan_tpu.utils.lru import LRUCache
        self.chunk_cache = LRUCache(max_entries=256)
        # sig -> {"pool": pytree [cap, ...] | None, "cap": int,
        #         "row_bytes": int, "map": OrderedDict key -> row (LRU
        #         order), "next": int high-water mark}
        self._shapes: dict = {}

    def _state(self, sig: Hashable) -> dict:
        if sig not in self._shapes:
            self._shapes[sig] = {"pool": None, "cap": 0, "row_bytes": 0,
                                 "map": OrderedDict(), "next": 0}
        return self._shapes[sig]

    def _row_cap(self, st: dict, chunk_rows: int) -> int:
        """Rows this shape may occupy: per-shape cap, shrunk when the
        global byte budget is exhausted — but never below what's already
        allocated or below one full chunk (the pool must be able to pin a
        whole chunk at once, including rows pinned by a pending fused
        program: ensure_rows counts those in chunk_rows, so max_rows is
        LIFTED when one chunk's pins exceed it rather than raising
        mid-epoch)."""
        rb = max(st["row_bytes"], 1)
        spare = max(self.max_bytes - self.resident_bytes, 0)
        budget_rows = st["cap"] + spare // rb
        return max(chunk_rows, st["cap"],
                   min(self.max_rows, budget_rows))

    def _alloc_row(self, st: dict, pinned: set, row_cap: int) -> int:
        if st["next"] < row_cap:
            st["next"] += 1
            return st["next"] - 1
        for k in st["map"]:  # iterate LRU -> MRU
            if st["map"][k] not in pinned:
                return st["map"].pop(k)
        raise RuntimeError(
            f"CleanSidePool: row cap {row_cap} all pinned "
            f"by one chunk — raise the bound above the chunk width")

    def _grow_to(self, st: dict, needed: int, proto, row_cap: int) -> None:
        """Geometric capacity growth, bounded by the row cap."""
        import jax
        import jax.numpy as jnp
        cap = st["cap"]
        if needed <= cap:
            return
        new_cap = max(cap, 1)
        while new_cap < needed:
            new_cap *= 2
        new_cap = min(max(new_cap, needed), row_cap)

        def alloc(p, v):
            z = jnp.zeros((new_cap,) + v.shape[1:], v.dtype)
            return z if p is None else z.at[:cap].set(p)

        if st["pool"] is None:
            st["pool"] = jax.tree_util.tree_map(
                lambda v: alloc(None, v), proto)
        else:
            st["pool"] = jax.tree_util.tree_map(alloc, st["pool"], proto)
        st["cap"] = new_cap
        self.resident_bytes += (new_cap - cap) * st["row_bytes"]

    def ensure(self, sig: Hashable, keys: Sequence[Hashable],
               compute: Callable[[], Any], mesh=None) -> Any:
        """With `mesh`, gathered chunks come out sharded over the data
        axis and inserts accept data-sharded values (see _jit_gather /
        _jit_scatter) — per-utterance warm hits survive re-shuffled chunk
        composition under mesh-sharded scoring exactly like single-chip."""
        import jax
        import jax.numpy as jnp

        st = self._state(sig)
        rows = [st["map"].get(k) for k in keys]
        if st["pool"] is not None and all(r is not None for r in rows):
            for k in keys:                       # refresh LRU order
                st["map"].move_to_end(k)
            self.hits += 1
            idx = jnp.asarray(rows, jnp.int32)
            return _jit_gather(mesh)(st["pool"], idx)

        self.misses += 1
        vals = compute()                         # stacked [B, ...] pytree
        if st["row_bytes"] == 0:
            st["row_bytes"] = sum(
                v.nbytes // max(v.shape[0], 1)
                for v in jax.tree_util.tree_leaves(vals))
        row_cap = self._row_cap(st, len(set(keys)))
        # insert every key this chunk computed (first occurrence wins —
        # padded rows repeat a key with identical values)
        pinned = {r for r in rows if r is not None}
        first_j: dict = {}
        for j, k in enumerate(keys):
            first_j.setdefault(k, j)
        need = [k for k in first_j if k not in st["map"]]
        dest: List[int] = []
        for k in need:
            r = self._alloc_row(st, pinned, row_cap)
            st["map"][k] = r
            pinned.add(r)
            dest.append(r)
        for k in keys:
            st["map"].move_to_end(k)
        if dest:
            self._grow_to(st, max(dest) + 1, vals, row_cap)
            didx = jnp.asarray(dest, jnp.int32)
            tidx = jnp.asarray([first_j[k] for k in need], jnp.int32)
            st["pool"] = _jit_scatter(mesh)(st["pool"], vals, didx, tidx)
            if mesh is not None and jax.devices()[0].platform == "cpu":
                # the scatter all-gathers sharded rows: a collective.
                # XLA:CPU's in-process rendezvous F-check-aborts when two
                # partitioned programs interleave (see score_corpus /
                # Trainer._mesh_barrier); settle it before the caller
                # dispatches the next partitioned program.  Real TPU
                # meshes rendezvous on ICI — no barrier, async pipeline.
                jax.block_until_ready(st["pool"])
        return vals

    def ensure_rows(self, sig: Hashable, keys: Sequence[Hashable],
                    compute: Callable[[], Any],
                    pinned_rows: set | None = None):
        """Resolve pool ROW INDICES for `keys` without gathering,
        computing + inserting any missing rows first.

        For callers that fuse the row gather into a larger device
        program (the scanned D pass feeds the pool arrays plus [G, B]
        index matrices into ONE jit instead of dispatching a gather per
        group).  `pinned_rows` are rows already resolved for the same
        pending program: they survive this call's evictions, and the
        row cap is lifted to fit them (jax arrays are immutable, so
        once the program is dispatched, later inserts cannot disturb
        it).  Returns (pool_pytree, row_list); the returned pool
        contains every key's row."""
        import jax.numpy as jnp

        st = self._state(sig)
        pinned = set(pinned_rows or ())
        rows = [st["map"].get(k) for k in keys]
        if st["pool"] is not None and all(r is not None for r in rows):
            for k in keys:                       # refresh LRU order
                st["map"].move_to_end(k)
            self.hits += 1
            return st["pool"], rows

        self.misses += 1
        vals = compute()                         # stacked [B, ...] pytree
        if st["row_bytes"] == 0:
            import jax
            st["row_bytes"] = sum(
                v.nbytes // max(v.shape[0], 1)
                for v in jax.tree_util.tree_leaves(vals))
        first_j: dict = {}
        for j, k in enumerate(keys):
            first_j.setdefault(k, j)
        need = [k for k in first_j if k not in st["map"]]
        # the cap must fit every externally pinned row PLUS this call's
        # keys (slight over-count when they overlap — only lifts the
        # bound, never starves the alloc)
        row_cap = self._row_cap(st, len(set(keys)) + len(pinned))
        pinned |= {r for r in rows if r is not None}
        dest: List[int] = []
        for k in need:
            r = self._alloc_row(st, pinned, row_cap)
            st["map"][k] = r
            pinned.add(r)
            dest.append(r)
        for k in keys:
            st["map"].move_to_end(k)
        if dest:
            self._grow_to(st, max(dest) + 1, vals, row_cap)
            didx = jnp.asarray(dest, jnp.int32)
            tidx = jnp.asarray([first_j[k] for k in need], jnp.int32)
            st["pool"] = _jit_scatter(None)(st["pool"], vals, didx, tidx)
        return st["pool"], [st["map"][k] for k in keys]

    def gather_rows(self, sig: Hashable, rows: Sequence[int]):
        """Stacked pytree for rows resolved by ensure_rows — one device
        dispatch regardless of row count (single-device layout)."""
        import jax.numpy as jnp
        st = self._state(sig)
        return _jit_gather(None)(st["pool"], jnp.asarray(rows, jnp.int32))

    def __len__(self) -> int:
        return sum(len(st["map"]) for st in self._shapes.values())

    def clear(self) -> None:
        self._shapes.clear()
        self.chunk_cache.clear()
        self.resident_bytes = 0
