"""Bounded LRU mapping for on-device cache entries.

score_corpus's clean_cache holds per-chunk device arrays (~10 MB each:
SIIB KLT bases, HASPI clean-side envelopes).  Chunk-composition keys from
a *shuffled* training sample rarely repeat, so an unbounded dict would
leak HBM every epoch; this cache evicts least-recently-used entries
(dropping the last reference frees the device buffers) while the
fixed-composition validation chunks stay resident and keep hitting.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Any, Hashable


class LRUCache:
    """Minimal dict-like LRU used as a score_corpus clean_cache."""

    def __init__(self, max_entries: int = 256):
        assert max_entries > 0
        self.max_entries = max_entries
        self._d: "OrderedDict[Hashable, Any]" = OrderedDict()

    def get(self, key: Hashable, default: Any = None) -> Any:
        if key in self._d:
            self._d.move_to_end(key)
            return self._d[key]
        return default

    def __getitem__(self, key: Hashable) -> Any:
        if key not in self._d:
            raise KeyError(key)
        return self.get(key)

    def __setitem__(self, key: Hashable, value: Any) -> None:
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.max_entries:
            self._d.popitem(last=False)

    def __contains__(self, key: Hashable) -> bool:
        return key in self._d

    def __len__(self) -> int:
        return len(self._d)

    def clear(self) -> None:
        self._d.clear()
