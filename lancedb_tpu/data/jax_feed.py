"""StreamingDataset → sharded `jax.Array` training batches.

The reference's StreamingDataset feeds PyTorch DataLoaders
(reference python streaming.py:48-598); the TPU-native consumer is a
jit-compiled training step over a `jax.sharding.Mesh`. This module is
that bridge (SURVEY.md §3.5 TPU mapping):

* samples stream from the elastic StreamingDataset (fixed virtual
  splits → topology-independent checkpoints survive re-sharding);
* each host stacks its local rows into numpy column batches;
* `jax.make_array_from_process_local_data` assembles the GLOBAL
  sharded batch — on a multi-host mesh every process contributes its
  local shard and XLA never gathers the batch anywhere;
* a background thread keeps `prefetch` assembled batches ahead so
  host-side Arrow→numpy work overlaps device compute (the standard
  TPU input-pipeline double-buffer).

Resumability: `state_dict()/load_state_dict()` delegate to the
underlying dataset — per-split consumption counts, so a checkpoint
taken at world_size=4 resumes correctly at world_size=8.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator

import numpy as np

from ..errors import InvalidInputError


def _stack_column(values: list) -> np.ndarray:
    first = values[0]
    if isinstance(first, (list, tuple, np.ndarray)):
        # preserve dtype: token-id columns must stay integral (a f32
        # cast would corrupt ids >= 2^24); floats keep their width
        arr = np.stack([np.asarray(v) for v in values])
        if arr.dtype == object:
            raise InvalidInputError(
                "ragged or non-numeric nested column in a jax feed"
            )
        if arr.dtype == np.float64:
            arr = arr.astype(np.float32)  # device-friendly default
        return arr
    arr = np.asarray(values)
    if arr.dtype == object:
        raise InvalidInputError(
            "non-numeric column in a jax feed; select numeric/vector columns"
        )
    return arr


class JaxBatchFeeder:
    """Iterate fixed-size, mesh-sharded `jax.Array` batches.

    dataset:    a StreamingDataset for THIS process (rank/world_size
                already set). Its transform must yield dict rows
                (the default transform does).
    batch_size: rows per GLOBAL batch. Must divide by the data-sharded
                device count. Each process contributes
                batch_size // jax.process_count() rows.
    sharding:   a jax.sharding.Sharding for batches (default: batch
                axis over all devices of a 1-D mesh).
    columns:    restrict/order the emitted columns.
    prefetch:   assembled batches to keep ahead (background thread).
    drop_last:  drop the trailing partial batch (jit needs static
                shapes; a partial batch would recompile the step).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        sharding=None,
        columns: list[str] | None = None,
        prefetch: int = 2,
        drop_last: bool = True,
        transform: Callable[[dict], dict] | None = None,
    ):
        import jax

        if sharding is None:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            mesh = Mesh(np.asarray(jax.devices()), ("data",))
            sharding = NamedSharding(mesh, PartitionSpec("data"))
        self._ds = dataset
        self._sharding = sharding
        self._columns = columns
        self._prefetch = max(1, prefetch)
        self._drop_last = drop_last
        self._transform = transform
        n_proc = jax.process_count()
        if batch_size % n_proc:
            raise InvalidInputError(
                f"batch_size {batch_size} must divide by process_count {n_proc}"
            )
        try:
            sharding.shard_shape((batch_size,))
        except Exception:
            raise InvalidInputError(
                f"batch_size {batch_size} does not shard evenly over the mesh"
            ) from None
        self._local_rows = batch_size // n_proc
        self.batch_size = batch_size

    # ------------------------------------------------------- state pass-through
    def state_dict(self) -> dict:
        return self._ds.state_dict()

    def load_state_dict(self, state: dict) -> None:
        self._ds.load_state_dict(state)

    # ------------------------------------------------------------------ iterate
    def _assemble(self, rows: list[dict]) -> dict[str, np.ndarray]:
        if self._transform is not None:
            rows = [self._transform(r) for r in rows]
        keys = self._columns or [k for k in rows[0] if not k.startswith("_")]
        return {k: _stack_column([r[k] for r in rows]) for k in keys}

    def _local_batches(self) -> Iterator[dict[str, np.ndarray]]:
        buf: list[dict] = []
        for row in self._ds:
            buf.append(row)
            if len(buf) == self._local_rows:
                yield self._assemble(buf)
                buf = []
        if buf and not self._drop_last:
            yield self._assemble(buf)

    def __iter__(self) -> Iterator[dict[str, Any]]:
        import jax

        q: queue.Queue = queue.Queue(maxsize=self._prefetch)
        done = object()
        stop = threading.Event()
        err: list[BaseException] = []

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for local in self._local_batches():
                    global_batch = {
                        k: jax.make_array_from_process_local_data(self._sharding, v)
                        for k, v in local.items()
                    }
                    if not _put(global_batch):
                        return  # consumer abandoned the iterator
            except BaseException as e:  # surface in the consumer
                err.append(e)
            finally:
                # deliver the sentinel: block while the consumer drains,
                # bail if it abandoned the iterator (stop set)
                while True:
                    try:
                        q.put(done, timeout=0.1)
                        break
                    except queue.Full:
                        if stop.is_set():
                            break

        t = threading.Thread(target=produce, daemon=True, name="lancedb-jax-feed")
        t.start()
        try:
            while True:
                item = q.get()
                if item is done:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            # early exit (break / islice / GeneratorExit): release the
            # producer so it does not stay parked on a full queue. Note
            # the dataset cursor has advanced by up to prefetch+1
            # batches — inherent to streaming prefetch; checkpoint via
            # state_dict() BEFORE iterating if exact resume matters.
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5)

    def __len__(self) -> int:
        # batches = rows this process will see / local rows per batch
        n = len(self._ds)
        return n // self._local_rows if self._drop_last else -(-n // self._local_rows)
