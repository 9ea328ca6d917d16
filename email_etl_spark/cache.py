"""Directory-keyed DataFrame-handle caches with explicit invalidation.

Serving layers memoize `spark.read.parquet(index_dir)` handles so a
query doesn't re-list the partition tree per call (plans/dedup.py
_IDX_CACHE, plans/search.py _LIT_CACHE). That is safe for the
build-once test/bench lifecycle, but a LONG-LIVED service that runs
streaming index maintenance would pin stale plans: compaction
stage-then-swaps the base directory, so a cached handle either reads
the pre-compact listing or errors on the deleted path. The compaction
paths (streaming/ann_index.py, streaming/text_index.py) call
`invalidate_under(index_root)` after the swap, which drops every
registered cache entry whose key resolves to a path under that root.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

# (cache_dict, key -> path-or-None, on_drop-or-None)
_REGISTRY: list[
    tuple[dict, Callable[[Any], str | None], Callable[[Any], None] | None]
] = []


def register_dir_cache(
    cache: dict,
    key_to_path: Callable[[Any], str | None],
    on_drop: Callable[[Any], None] | None = None,
) -> None:
    """Register a module-level cache whose entries are keyed (possibly
    among other things) by a directory path. `key_to_path` maps a cache
    key to that path, or None for non-directory entries (those are
    never invalidated here). `on_drop`, when given, is called with each
    dropped VALUE — caches holding `.cache()`d DataFrames pass an
    unpersist callback here, because dropping the dict entry alone
    would leave the stale blocks pinned in executor storage."""
    _REGISTRY.append((cache, key_to_path, on_drop))


def unpersist_value(value: Any) -> None:
    """Default on_drop for caches of persisted DataFrames (or tuples
    of them): best-effort unpersist of everything that supports it."""
    items = value if isinstance(value, (tuple, list)) else (value,)
    for item in items:
        unpersist = getattr(item, "unpersist", None)
        if callable(unpersist):
            try:
                unpersist(False)
            except Exception:
                pass  # session already stopped; nothing to release


def _under(path: str, root: str) -> bool:
    path = os.path.abspath(path)
    root = os.path.abspath(root)
    return path == root or path.startswith(root + os.sep)


def invalidate_under(root: str) -> int:
    """Drop every registered cache entry whose key path lies under
    `root` (inclusive). Returns the number of dropped entries."""
    dropped = 0
    for cache, key_to_path, on_drop in _REGISTRY:
        stale = []
        for key in cache:
            p = key_to_path(key)
            if p is not None and _under(p, root):
                stale.append(key)
        for key in stale:
            value = cache.pop(key)
            if on_drop is not None:
                on_drop(value)
            dropped += 1
    return dropped
