"""Session: shared caches + background read-consistency refresh.

Reference: the re-exported lance `Session` (lib.rs re-exports; sizing
knobs for index/metadata caches) and the Eventual-consistency
background cache (utils/background_cache.rs — refresh_window =
min(3s, TTL/4), table/dataset.rs:14-55).

The index cache matters doubly on TPU: loaded searchers pin HBM
(padded partitions, PQ codes), so the cache budget is effectively the
device-memory budget for serving. Eviction drops the device arrays;
reloading from the object store is cheap and lazy.
"""

from __future__ import annotations

import threading
import weakref
from collections import OrderedDict

DEFAULT_INDEX_CACHE_BYTES = 8 << 30  # leave headroom on a 16 GB v5e


def _searcher_nbytes(searcher) -> int:
    total = 0
    dev = getattr(searcher, "_device", None)
    if dev:
        for arr in dev.values():
            total += arr.size * arr.dtype.itemsize
    else:
        # host-resident searchers (HNSW, FTS postings)
        for attr in ("storage", "row_ids_flat"):
            obj = getattr(searcher, attr, None)
            if obj is None:
                continue
            import numpy as np

            if isinstance(obj, np.ndarray):
                total += obj.nbytes
            else:
                for v in vars(obj).values():
                    if isinstance(v, np.ndarray):
                        total += v.nbytes
    return max(total, 1)


class Session:
    """Cross-table cache of loaded index searchers with a byte budget."""

    def __init__(
        self,
        index_cache_size_bytes: int = DEFAULT_INDEX_CACHE_BYTES,
        metadata_cache_size_bytes: int = 256 << 20,
    ):
        self.index_cache_size_bytes = index_cache_size_bytes
        self.metadata_cache_size_bytes = metadata_cache_size_bytes
        self._lock = threading.Lock()
        self._cache: OrderedDict[str, tuple[object, int]] = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0
        self.evictions = 0

    def get_or_load(self, key: str, loader):
        with self._lock:
            if key in self._cache:
                self._cache.move_to_end(key)
                self.hits += 1
                return self._cache[key][0]
            self.misses += 1
        obj = loader()
        size = _searcher_nbytes(obj)
        with self._lock:
            self._cache[key] = (obj, size)
            self._bytes += size
            while self._bytes > self.index_cache_size_bytes and len(self._cache) > 1:
                _, (old, old_size) = self._cache.popitem(last=False)
                self._bytes -= old_size
                self.evictions += 1
        return obj

    def invalidate(self, prefix: str = "") -> None:
        with self._lock:
            for k in [k for k in self._cache if k.startswith(prefix)]:
                _, size = self._cache.pop(k)
                self._bytes -= size

    def stats(self) -> dict:
        with self._lock:
            return {
                "entries": len(self._cache),
                "bytes": self._bytes,
                "budget_bytes": self.index_cache_size_bytes,
                "hits": self.hits,
                "misses": self.misses,
                "evictions": self.evictions,
            }


class BackgroundRefresher:
    """Daemon thread keeping Eventual-consistency tables fresh.

    Reference background_cache semantics: with a TTL interval, refresh
    proactively at min(3s, TTL/4) before expiry so reads rarely pay the
    manifest round trip.
    """

    def __init__(self, interval: float):
        self.interval = interval
        refresh_window = min(3.0, interval / 4.0)
        self._period = max(interval - refresh_window, interval * 0.5, 0.05)
        self._tables: list[weakref.ref] = []
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def register(self, table) -> None:
        with self._lock:
            self._tables.append(weakref.ref(table))
            if self._thread is None:
                self._thread = threading.Thread(target=self._run, daemon=True)
                self._thread.start()

    def _run(self) -> None:
        while not self._stop.wait(self._period):
            with self._lock:
                refs = list(self._tables)
            live = []
            for ref in refs:
                t = ref()
                if t is None:
                    continue
                live.append(ref)
                try:
                    t._background_refresh()
                except Exception:
                    pass
            with self._lock:
                self._tables = live
                if not live:
                    self._thread = None
                    return

    def stop(self) -> None:
        self._stop.set()
