"""Process-local broadcast cache.

``ray.put`` once on the driver; inside stateless ``map_batches`` tasks call
``get_broadcast(ref)`` — each long-lived Ray worker process deserializes the
object once and caches it, giving actor-pool-style state amortization with
task-pool elasticity (no pool ramp-up, instant scale-out). Numpy payloads
stay zero-copy from the object store either way.
"""

from __future__ import annotations

from typing import Any, Dict

import ray

_CACHE: Dict[str, Any] = {}


def get_broadcast(ref: "ray.ObjectRef") -> Any:
    key = ref.hex()
    if key in _CACHE:
        # true LRU: move the hit to the end, else a pipeline touching 9+
        # dims evicts its HOTTEST ref (FIFO) and re-deserializes per batch
        _CACHE[key] = _CACHE.pop(key)
    else:
        _CACHE[key] = ray.get(ref)
        # bound the cache: evict least-recently-used beyond a handful of dims
        if len(_CACHE) > 8:
            for k in list(_CACHE)[:-8]:
                del _CACHE[k]
    return _CACHE[key]
