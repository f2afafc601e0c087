"""Process-level content-addressed device-array cache.

A grid campaign (exp/runner.py) calls ``train_model`` once per member, and
every call re-stages the same device-resident corpus — the training array
(tens of MB) plus the eval batches — over the tunnel even when members
differ only in ``cfg.seed``.  The reference has no such cost (its torch
loop keeps host tensors and streams batches, train_model.py:418-470), so
this re-staging is pure framework tax; the campaign A/B measured the
sequential arm's per-member overhead at ~30-40 s on TPU v5e behind the
tunnel (BENCH.md, campaign table).

Keys are CONTENT hashes (blake2b over the raw bytes + shape + dtype), not
object identities: the split pipeline rebuilds fresh numpy arrays with
identical values for every member of a seed grid, and content addressing
is also immune to id() reuse after garbage collection.  An LRU bound caps
the HBM held by stale grid points (a PhysioNet seed_data grid cycles ~10
distinct corpora of ~80 MB).
"""

from __future__ import annotations

import collections
import hashlib
import threading

import numpy as np

MAX_ENTRIES = 16

_lock = threading.Lock()
_cache: collections.OrderedDict = collections.OrderedDict()
_stats = {"hits": 0, "misses": 0}


def _key(a: np.ndarray) -> tuple:
    h = hashlib.blake2b(digest_size=16)
    h.update(a.data if a.flags["C_CONTIGUOUS"] else a.tobytes())
    return (h.digest(), a.shape, str(a.dtype))


def device_array(arr):
    """jnp.asarray with process-level content-addressed reuse.

    Returns the SAME committed device buffer for equal-content inputs, so
    the second and later members of a grid skip the host→device transfer.
    Non-numpy inputs (already-staged jax arrays, lists) fall through to a
    plain jnp.asarray uncached.
    """
    import jax.numpy as jnp

    if not isinstance(arr, np.ndarray):
        return jnp.asarray(arr)
    key = _key(arr)
    with _lock:
        if key in _cache:
            _cache.move_to_end(key)
            _stats["hits"] += 1
            return _cache[key]
    dev = jnp.asarray(arr)
    with _lock:
        _cache[key] = dev
        _stats["misses"] += 1
        while len(_cache) > MAX_ENTRIES:
            _cache.popitem(last=False)  # LRU: dropping the ref frees HBM
    return dev


def stats() -> dict:
    with _lock:
        return dict(_stats)


def clear() -> None:
    """Drop every cached buffer (tests; frees HBM eagerly)."""
    with _lock:
        _cache.clear()
        _stats["hits"] = _stats["misses"] = 0
