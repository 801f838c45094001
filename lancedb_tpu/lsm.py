"""LSM / MemWAL ingest path: high-frequency upserts without base-table
rewrites.

Reference semantics being matched (SURVEY.md §2.1 "Update/Delete/
Merge" + "LSM checkpoint"; rust table.rs:379-530 sharding specs,
merge/lsm.rs ShardWriter routing, checkpoint.rs client-driven
checkpoint):

* ``set_lsm_write_spec`` installs a sharding spec — rows route to a
  shard by hashed key (bucket), direct integer key (identity), or a
  single shard (unsharded).
* ``merge_insert(...).use_lsm()`` appends rows to the shard's WAL as an
  immutable Arrow IPC segment — O(rows written), no join against the
  base table.
* Reads with LSM enabled merge WAL rows over the base table with
  last-write-wins PK dedup (newest generation wins).
* ``flush_lsm`` folds WAL segments into the base table through the
  normal single-commit merge_insert, then removes the consumed
  segments. ``checkpoint_lsm`` seals first so concurrent writers land
  in a fresh generation, then flushes until the sealed rows are gone —
  the reference's client-driven convergence loop.

Layout under the table root::

    _lsm/spec.json
    _lsm/shard_<k>/<generation>-<uuid>.arrow     (WAL segments)
"""

from __future__ import annotations

import hashlib
import io
import json
import time

import numpy as np
import pyarrow as pa
import pyarrow.ipc as ipc

from .errors import InvalidInputError
from .storage.manifest import new_uuid

LSM_DIR = "_lsm"


class LsmSpec:
    def __init__(self, mode: str, key_columns: list[str], num_shards: int = 1):
        if mode not in ("bucket", "identity", "unsharded"):
            raise InvalidInputError(f"unknown LSM sharding mode {mode!r}")
        if not key_columns:
            raise InvalidInputError("LSM spec needs key columns (the primary key)")
        if mode == "bucket" and num_shards < 1:
            raise InvalidInputError("bucket sharding needs num_shards >= 1")
        self.mode = mode
        self.key_columns = list(key_columns)
        self.num_shards = num_shards if mode == "bucket" else (num_shards or 1)

    def to_json(self) -> dict:
        return {
            "mode": self.mode,
            "key_columns": self.key_columns,
            "num_shards": self.num_shards,
        }

    @staticmethod
    def from_json(d: dict) -> "LsmSpec":
        return LsmSpec(d["mode"], d["key_columns"], d.get("num_shards", 1))

    def shard_of(self, key_values: tuple) -> int:
        if self.mode == "unsharded":
            return 0
        if self.mode == "identity":
            v = key_values[0]
            if not isinstance(v, (int, np.integer)):
                raise InvalidInputError("identity sharding needs an integer key")
            return int(v) % self.num_shards
        blob = "\x1f".join(repr(v) for v in key_values).encode()
        return int.from_bytes(hashlib.md5(blob).digest()[:8], "little") % self.num_shards


class LsmStore:
    """Host-side manager for one table's WAL state."""

    def __init__(self, dataset):
        self._ds = dataset
        self._store = dataset.store
        self._root = dataset.root

    # ------------------------------------------------------------- spec
    def _spec_path(self) -> str:
        return f"{self._root}/{LSM_DIR}/spec.json"

    def set_spec(self, spec: LsmSpec) -> None:
        for c in spec.key_columns:
            if c not in self._ds.schema.names:
                raise InvalidInputError(f"LSM key column {c!r} not in schema")
        self._store.write_bytes(self._spec_path(), json.dumps(spec.to_json()).encode())

    def get_spec(self) -> LsmSpec | None:
        try:
            return LsmSpec.from_json(json.loads(self._store.read_bytes(self._spec_path())))
        except FileNotFoundError:
            return None

    def drop_spec(self, *, force: bool = False) -> None:
        if not force and self.total_wal_rows() > 0:
            raise InvalidInputError("LSM WAL is not empty; flush first or pass force=True")
        self._store.delete(f"{self._root}/{LSM_DIR}")

    # ------------------------------------------------------------ write
    def append(self, data: pa.Table) -> dict:
        """Route rows to shard WALs; one immutable segment per shard."""
        spec = self.get_spec()
        if spec is None:
            raise InvalidInputError("no LSM write spec installed; call set_lsm_write_spec")
        data = self._ds._align_to_schema(data)
        keys = list(zip(*[data.column(c).to_pylist() for c in spec.key_columns]))
        shard_rows: dict[int, list[int]] = {}
        for i, k in enumerate(keys):
            shard_rows.setdefault(spec.shard_of(k), []).append(i)
        gen = time.time_ns()
        written = {}
        for shard, rows in shard_rows.items():
            part = data.take(pa.array(rows))
            sink = io.BytesIO()
            with ipc.new_file(sink, part.schema) as w:
                for b in part.to_batches():
                    w.write_batch(b)
            name = f"{self._root}/{LSM_DIR}/shard_{shard}/{gen:020d}-{new_uuid()}.arrow"
            self._store.write_bytes(name, sink.getvalue())
            written[shard] = len(rows)
        return {"num_rows": data.num_rows, "shards": written, "generation": gen}

    # ------------------------------------------------------------- read
    def _segments(self, shard: int | None = None) -> list[str]:
        out = []
        base = f"{self._root}/{LSM_DIR}"
        shards = (
            [f"{base}/shard_{shard}"]
            if shard is not None
            else [p for p in self._store.list(base) if p.rsplit("/", 1)[-1].startswith("shard_")]
        )
        for sd in shards:
            out.extend(p for p in self._store.list(sd) if p.endswith(".arrow"))
        return sorted(out)  # generation-prefixed names sort chronologically

    def wal_rows(self, max_generation: int | None = None) -> pa.Table | None:
        """All live WAL rows, PK-deduped latest-wins."""
        spec = self.get_spec()
        if spec is None:
            return None
        parts = []
        for path in self._segments():
            gen = int(path.rsplit("/", 1)[-1].split("-", 1)[0])
            if max_generation is not None and gen > max_generation:
                continue
            data = self._store.read_bytes(path)
            parts.append(ipc.open_file(pa.BufferReader(data)).read_all())
        if not parts:
            return None
        merged = pa.concat_tables(parts)  # chronological
        # latest-wins dedup on the key columns
        keys = list(zip(*[merged.column(c).to_pylist() for c in spec.key_columns]))
        last_index: dict = {}
        for i, k in enumerate(keys):
            last_index[k] = i
        keep = sorted(last_index.values())
        return merged.take(pa.array(keep))

    def total_wal_rows(self) -> int:
        t = self.wal_rows()
        return t.num_rows if t is not None else 0

    # ---------------------------------------------------------- maintain
    def flush(self, max_generation: int | None = None) -> dict:
        """Fold WAL rows into the base table (one merge_insert commit per
        flush) and drop the consumed segments."""
        spec = self.get_spec()
        if spec is None:
            raise InvalidInputError("no LSM spec installed")
        segments = self._segments()
        if max_generation is not None:
            segments = [
                p
                for p in segments
                if int(p.rsplit("/", 1)[-1].split("-", 1)[0]) <= max_generation
            ]
        if not segments:
            return {"rows_flushed": 0, "segments_removed": 0}
        rows = self.wal_rows(max_generation=max_generation)
        stats = self._ds.merge_insert(
            rows,
            on=spec.key_columns,
            when_matched_update_all=True,
            when_not_matched_insert_all=True,
        )
        for p in segments:
            self._store.delete(p)
        return {
            "rows_flushed": rows.num_rows,
            "segments_removed": len(segments),
            "merge": stats,
        }

    def checkpoint(self, timeout: float = 60.0) -> dict:
        """Seal the current generation, flush until it is durable in the
        base table (reference checkpoint.rs: seal once → compact → poll
        generations until the initial L0 is gone)."""
        seal_gen = time.time_ns()  # everything ≤ seal_gen must converge
        deadline = time.monotonic() + timeout
        flushed = {"rows_flushed": 0, "segments_removed": 0}
        while time.monotonic() < deadline:
            res = self.flush(max_generation=seal_gen)
            flushed["rows_flushed"] += res["rows_flushed"]
            flushed["segments_removed"] += res["segments_removed"]
            remaining = [
                p
                for p in self._segments()
                if int(p.rsplit("/", 1)[-1].split("-", 1)[0]) <= seal_gen
            ]
            if not remaining:
                return {"sealed_generation": seal_gen, **flushed}
            time.sleep(0.05)
        raise TimeoutError("checkpoint_lsm did not converge")

    def stats(self) -> dict:
        spec = self.get_spec()
        if spec is None:
            return {"enabled": False}
        shards = {}
        total_rows = 0
        total_bytes = 0
        for path in self._segments():
            shard = int(path.split("/shard_")[-1].split("/")[0])
            size = self._store.size(path)
            data = self._store.read_bytes(path)
            nrows = ipc.open_file(pa.BufferReader(data)).read_all().num_rows
            s = shards.setdefault(shard, {"segments": 0, "rows": 0, "bytes": 0})
            s["segments"] += 1
            s["rows"] += nrows
            s["bytes"] += size
            total_rows += nrows
            total_bytes += size
        return {
            "enabled": True,
            "spec": spec.to_json(),
            "shards": shards,
            "total_wal_rows": total_rows,
            "total_wal_bytes": total_bytes,
        }
