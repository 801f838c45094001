"""Async-native SDK surface.

Reference: the python async SDK (python table.py `AsyncTable`
:4511+, query.py `AsyncQuery`/`AsyncVectorQuery`/`AsyncFTSQuery`/
`AsyncHybridQuery`) over a tokio core. Here the core is synchronous
Python + JAX, so the async layer is designed around three rules:

1. **Bounded shared executor** — all blocking work runs on one named
   ThreadPoolExecutor (not the default to_thread pool), so a burst of
   queries cannot exhaust the interpreter with unbounded threads and
   CPU-heavy JAX dispatches queue fairly.
2. **True streaming** — ``to_batches`` drives the sync fragment-
   streaming iterator in a worker thread and hands batches to the
   event loop through a bounded asyncio queue (backpressure: the
   producer blocks when the consumer lags), never materializing the
   full result.
3. **Builder parity** — the async builders expose the same fluent
   method set as the sync ones; every terminal method is a coroutine.
"""

from __future__ import annotations

import asyncio
import concurrent.futures
import os
import threading
from typing import Any, AsyncIterator

import pyarrow as pa

_EXECUTOR: concurrent.futures.ThreadPoolExecutor | None = None
_EXECUTOR_LOCK = threading.Lock()


def _executor() -> concurrent.futures.ThreadPoolExecutor:
    global _EXECUTOR
    with _EXECUTOR_LOCK:
        if _EXECUTOR is None:
            _EXECUTOR = concurrent.futures.ThreadPoolExecutor(
                max_workers=min(32, (os.cpu_count() or 8) + 4),
                thread_name_prefix="lancedb-aio",
            )
        return _EXECUTOR


async def _run(fn, *args, **kwargs):
    loop = asyncio.get_running_loop()
    if kwargs:
        return await loop.run_in_executor(_executor(), lambda: fn(*args, **kwargs))
    return await loop.run_in_executor(_executor(), fn, *args)


_DONE = object()


async def _stream(make_iter, queue_size: int = 4) -> AsyncIterator:
    """Drive a sync iterator in the executor; yield items with
    backpressure. Exceptions propagate; the producer stops if the
    consumer goes away."""
    loop = asyncio.get_running_loop()
    q: asyncio.Queue = asyncio.Queue(maxsize=queue_size)
    cancelled = threading.Event()

    def produce():
        try:
            for item in make_iter():
                if cancelled.is_set():
                    return
                asyncio.run_coroutine_threadsafe(q.put(item), loop).result()
            asyncio.run_coroutine_threadsafe(q.put(_DONE), loop).result()
        except BaseException as exc:  # propagate into the consumer
            asyncio.run_coroutine_threadsafe(q.put(exc), loop).result()

    fut = loop.run_in_executor(_executor(), produce)
    try:
        while True:
            item = await q.get()
            if item is _DONE:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        cancelled.set()
        # drain so a blocked producer can observe the cancel flag
        while not q.empty():
            q.get_nowait()
        await fut


# --------------------------------------------------------------------------
# query builders
# --------------------------------------------------------------------------


class AsyncQueryBase:
    """Fluent async query (reference python query.py AsyncQuery).

    Wraps a sync builder; fluent setters apply immediately (cheap),
    terminals run on the shared executor."""

    def __init__(self, sync_builder):
        self._b = sync_builder

    # -- fluent (sync, chainable) -------------------------------------------
    def where(self, predicate: str, prefilter: bool = True) -> "AsyncQueryBase":
        self._b.where(predicate, prefilter)
        return self

    filter = where

    def select(self, columns) -> "AsyncQueryBase":
        self._b.select(columns)
        return self

    def limit(self, k: int) -> "AsyncQueryBase":
        self._b.limit(k)
        return self

    def offset(self, n: int) -> "AsyncQueryBase":
        self._b.offset(n)
        return self

    def with_row_id(self, flag: bool = True) -> "AsyncQueryBase":
        self._b.with_row_id(flag)
        return self

    def order_by(self, *columns) -> "AsyncQueryBase":
        self._b.order_by(*columns)
        return self

    # -- terminals (async) ----------------------------------------------------
    async def to_arrow(self) -> pa.Table:
        return await _run(self._b.to_arrow)

    async def to_list(self) -> list[dict]:
        return await _run(self._b.to_list)

    async def to_pandas(self):
        return await _run(self._b.to_pandas)

    def to_batches(
        self, max_batch_length: int = 1024, timeout: float | None = None
    ) -> AsyncIterator[pa.RecordBatch]:
        """Async record-batch stream with backpressure (reference
        AsyncQuery.to_batches over the tokio RecordBatchStream)."""
        return _stream(lambda: self._b.to_batches(max_batch_length, timeout))

    def __aiter__(self) -> AsyncIterator[pa.RecordBatch]:
        return self.to_batches()

    async def explain_plan(self, verbose: bool = False) -> str:
        return await _run(self._b.explain_plan, verbose)

    async def analyze_plan(self) -> str:
        return await _run(self._b.analyze_plan)


class AsyncVectorQuery(AsyncQueryBase):
    """Reference python query.py AsyncVectorQuery."""

    def metric(self, metric: str) -> "AsyncVectorQuery":
        self._b.metric(metric)
        return self

    distance_type = metric

    def nprobes(self, n: int) -> "AsyncVectorQuery":
        self._b.nprobes(n)
        return self

    def minimum_nprobes(self, n: int) -> "AsyncVectorQuery":
        self._b.minimum_nprobes(n)
        return self

    def maximum_nprobes(self, n: int) -> "AsyncVectorQuery":
        self._b.maximum_nprobes(n)
        return self

    def refine_factor(self, rf: int) -> "AsyncVectorQuery":
        self._b.refine_factor(rf)
        return self

    def ef(self, ef: int) -> "AsyncVectorQuery":
        self._b.ef(ef)
        return self

    def distance_range(self, lower: float | None = None, upper: float | None = None):
        self._b.distance_range(lower, upper)
        return self

    def bypass_vector_index(self) -> "AsyncVectorQuery":
        self._b.bypass_vector_index()
        return self

    def fast_search(self) -> "AsyncVectorQuery":
        self._b.fast_search()
        return self

    def postfilter(self) -> "AsyncVectorQuery":
        """Apply the filter AFTER the vector search (reference
        AsyncVectorQuery.postfilter)."""
        self._b._req.prefilter = False
        return self


class AsyncFTSQuery(AsyncQueryBase):
    """Reference python query.py AsyncFTSQuery."""

    def get_query(self):
        """The query text or FTS AST node (reference query.py:3458)."""
        return self._b.get_query()

    def rerank(self, reranker) -> "AsyncFTSQuery":
        self._b.rerank(reranker)
        return self


class AsyncHybridQuery(AsyncQueryBase):
    """Reference python query.py AsyncHybridQuery."""

    def rerank(self, reranker) -> "AsyncHybridQuery":
        self._b.rerank(reranker)
        return self

    def nprobes(self, n: int) -> "AsyncHybridQuery":
        self._b.nprobes(n)
        return self
