"""Program-cache hygiene shared by the sharded execution paths.

Every sharded entry point caches compiled programs keyed by
``(id(problem), …)`` with a ``weakref.ref(problem)`` stored alongside:
id() alone is unsafe (a freed problem's id can be recycled by a later
problem of identical geometry — jit static metadata keeps configs alive,
so finalizers are unreliable), and the weakref makes every entry
self-validating.  This module holds the one copy of the eviction protocol
so the paths cannot drift (code-review r3).
"""


def evict_dead(*caches: dict) -> None:
    """Drop entries whose weakref'd problem has been collected.

    Called on every cache miss so sequential problems don't pin dead
    GB-scale constants (or stale compiled programs) in device memory.
    """
    for cache in caches:
        for k in [k for k, v in cache.items() if v[0]() is None]:
            del cache[k]
