"""Cache lifecycle for operator-internal ``.cache()`` calls.

Several operators cache an intermediate frame that both sides of a
self-join consume (shingle arrays, simhash signatures, rollup levels).
The cache is the right physical plan — but a bare ``.cache()`` with no
owner leaks: in a long-lived session running many corpora, cached tables
accumulate until eviction pressure.  Every operator cache therefore goes
through :func:`register_cache`, and callers release them:

- ``release_caches()`` — drop every operator cache registered so far
  (bench.py calls this after each timed query; long-running services
  call it between corpora).
- ``cache_scope()`` — context manager releasing exactly the caches
  registered inside the ``with`` block (composable: an outer scope keeps
  its own entries).

At 100 TB the memory cache is the wrong tool entirely for corpus-sized
intermediates — materialize to storage instead (``build_minhash_index``
is that shape for the shingle/band table); these handles govern the
single-job case where the cache is an intra-query reuse buffer.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

#: registry of live operator caches.  Guarded by _LOCK: concurrent query
#: threads on one driver (a Spark driver is routinely multi-threaded)
#: must not corrupt the list.  Scope NESTING is still a per-thread
#: notion: caches another thread registers inside this thread's
#: ``cache_scope`` block are released with the scope — safe (unpersist
#: is idempotent and the frame recomputes), just earlier than that
#: thread intended.  Threads needing isolated lifecycles should use
#: their own explicit marks.
_ACTIVE: list[DataFrame] = []
_LOCK = threading.Lock()


def register_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` with an owner: the returned frame is tracked and
    released by the next :func:`release_caches` / enclosing scope."""
    df.cache()
    with _LOCK:
        _ACTIVE.append(df)
    return df


def release_caches(from_mark: int = 0) -> int:
    """Unpersist every registered cache at/after ``from_mark`` (default:
    all).  Returns the number released.  Safe to call repeatedly —
    unpersist on an already-released frame is a no-op."""
    released = 0
    while True:
        with _LOCK:
            if len(_ACTIVE) <= from_mark:
                break
            df = _ACTIVE.pop()
        try:
            # unpersist outside the lock: it can block on the JVM
            df.unpersist()
            released += 1
        except Exception:
            # a dead session's frames can't (and needn't) be unpersisted
            pass
    return released


@contextmanager
def cache_scope():
    """Release exactly the operator caches created inside the block."""
    with _LOCK:
        mark = len(_ACTIVE)
    try:
        yield
    finally:
        release_caches(from_mark=mark)
