"""Cross-query node cache — the CachedRetrieval analog.

``CachedRetrieval`` (``core/.../retrieval/CachedRetrieval.java:23-99``)
memoizes node ITERATORS keyed by ``Node.toString()`` in in-memory index
parts, so a subtree shared by several queries — the ``#od:1(a b)`` of two
``#sdm`` queries with an overlapping bigram, or a hot term leaf in a
tuning sweep — is evaluated once (``cacheLeafNodes`` defaults true there;
scores stay uncached because smoothed scores depend on query weighting).

The Spark analog memoizes the compiled COUNT FRAME ``(doc, tf,
positions)`` per ``(node key, need_positions, index)``. The first query
pays the scan + window kernel; when a second query requests the same
subtree the frame is ``persist()``-ed (``MEMORY_AND_DISK``), so from then
on the plan reads the materialized in-memory columnar relation
(``InMemoryTableScan``) instead of re-running the posting scan —
Catalyst swaps the whole subtree for the cached relation, which is
plan-visible (tested by counting ``Scan parquet`` operators). Persisting
only on the SECOND request keeps single-use subtrees free: a cache over
a batch with no shared structure costs two dict lookups per node and
materializes nothing.

Scale note: a persisted count frame is the subtree's full (doc, tf)
result. For a hot term at 100 TB that is executor-memory-sized state, so
— like the reference, where CachedRetrieval is a separate opt-in class —
the cache is off unless a batch driver opts in (``batch-search
--node-cache``; tuning loops over a shared index are the intended user).
``MEMORY_AND_DISK`` spills instead of evicting mid-job, and ``close()``
unpersists everything the context pinned.

Thread-safety: the threaded batch path (``ThreadedBatchSearch`` analog)
compiles queries from a thread pool; entries are guarded by an RLock
(reentrant — compiling a parent recurses into the cache for its
children). Plan construction is milliseconds, so holding the lock across
a compile does not serialize anything that matters; execution (the
expensive part) happens outside the lock.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Callable, Iterator

from pyspark import StorageLevel
from pyspark.sql import DataFrame


@dataclass
class _Entry:
    frame: DataFrame
    requests: int = 1
    persisted: bool = False


@dataclass
class NodeCache:
    """Memo of compiled count frames, persist-on-second-use."""

    persist: bool = True
    _entries: dict[tuple[str, bool, int], _Entry] = field(default_factory=dict)
    _lock: threading.RLock = field(default_factory=threading.RLock)
    hits: int = 0
    misses: int = 0

    def get_or_compile(
        self,
        node,
        index,
        need_positions: bool,
        compile_fn: Callable[..., DataFrame],
    ) -> DataFrame:
        # str(node) is Galago's Node.toString() CSE key (nodes.py:54);
        # id(index) scopes entries to one opened index, mirroring "one
        # retrieval interacts with one index" (CachedRetrieval.java:35)
        key = (str(node), bool(need_positions), id(index))
        with self._lock:
            ent = self._entries.get(key)
            if ent is not None:
                ent.requests += 1
                self.hits += 1
                if self.persist and not ent.persisted:
                    ent.frame = ent.frame.persist(
                        StorageLevel.MEMORY_AND_DISK
                    )
                    ent.persisted = True
                return ent.frame
            self.misses += 1
            frame = compile_fn(node, index, need_positions)
            self._entries[key] = _Entry(frame)
            return frame

    @property
    def persisted_count(self) -> int:
        with self._lock:
            return sum(1 for e in self._entries.values() if e.persisted)

    def close(self) -> None:
        """Unpersist everything this cache pinned."""
        with self._lock:
            for ent in self._entries.values():
                if ent.persisted:
                    try:
                        ent.frame.unpersist()
                    except Exception:
                        pass  # session already stopped
            self._entries.clear()


_ACTIVE: NodeCache | None = None
_ACTIVE_LOCK = threading.Lock()


def active_cache() -> NodeCache | None:
    return _ACTIVE


@contextmanager
def node_cache(persist: bool = True) -> Iterator[NodeCache]:
    """Enable the cross-query node cache for the enclosed batch.

    A module-level (not contextvar) slot on purpose: the threaded batch
    path compiles from pool threads, which must see the driver's cache.
    Nested contexts restore the previous cache on exit.
    """
    global _ACTIVE
    cache = NodeCache(persist=persist)
    with _ACTIVE_LOCK:
        prev, _ACTIVE = _ACTIVE, cache
    try:
        yield cache
    finally:
        with _ACTIVE_LOCK:
            _ACTIVE = prev
        cache.close()
