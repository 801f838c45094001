"""Table API: the user-facing handle over one versioned dataset.

Mirrors the reference `Table` surface (rust table.rs:903-2232 `Table`,
python table.py `LanceTable`): data CRUD, query builders, index CRUD,
merge_insert, schema evolution, time travel/tags/branches, optimize.
The sync API is the core; `AsyncTable` (async facade) wraps it — the
inverse of the reference's arrangement (their sync wraps async over a
background event loop, background_loop.py:11-39) because our data
plane is synchronous JAX dispatch.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Literal

import numpy as np
import pyarrow as pa

from .arrow import is_vector_type as _is_vector_type
from .arrow import to_arrow_table, vector_column_name
from .errors import IndexNotFoundError, InvalidInputError
from .index import (
    FTS,
    BTree,
    Bitmap,
    Flat,
    IndexConfig,
    IvfFlat,
    IvfPq,
    IvfSq,
    LabelList,
    SCALAR_INDEX_TYPES,
    VECTOR_INDEX_TYPES,
)
from .query import (
    DEFAULT_TOP_K,
    LanceEmptyQueryBuilder,
    LanceQueryBuilder,
    LanceVectorQueryBuilder,
)
from .storage.dataset import Dataset


def _supported_btree_type(t: pa.DataType) -> bool:
    """Types Index::Auto maps to BTREE (reference utils/mod.rs:228-242)."""
    return (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_boolean(t)
        or pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_time(t)
        or pa.types.is_date(t)
        or pa.types.is_timestamp(t)
        or pa.types.is_fixed_size_binary(t)
    )


class Tags:
    """Tag CRUD (reference trait Tags, table.rs:345-377)."""

    def __init__(self, table: "Table"):
        self._table = table

    def create(self, name: str, version: int | None = None) -> None:
        self._table._dataset.create_tag(name, version)

    def list(self) -> dict[str, dict]:
        return self._table._dataset.list_tags()

    def update(self, name: str, version: int) -> None:
        self._table._dataset.update_tag(name, version)

    def delete(self, name: str) -> None:
        self._table._dataset.delete_tag(name)

    def get_version(self, name: str) -> int:
        return self._table._dataset.tag_version(name)


from dataclasses import dataclass as _dataclass


@_dataclass
class FtsToken:
    """One token produced by Table.tokenize (reference FtsToken,
    _lancedb.pyi:642)."""

    text: str
    position: int


class MergeInsertBuilder:
    """Fluent upsert builder (reference MergeInsertBuilder, merge.rs:66-223)."""

    def __init__(self, table: "Table", on: str | list[str]):
        self._table = table
        self._on = [on] if isinstance(on, str) else list(on)
        self._update_all = False
        self._update_condition: str | None = None
        self._insert_all = False
        self._delete_missing = False
        self._delete_condition: str | None = None

    def when_matched_update_all(self, where: str | None = None) -> "MergeInsertBuilder":
        self._update_all = True
        self._update_condition = where
        return self

    def when_not_matched_insert_all(self) -> "MergeInsertBuilder":
        self._insert_all = True
        return self

    def when_not_matched_by_source_delete(self, condition: str | None = None) -> "MergeInsertBuilder":
        self._delete_missing = True
        self._delete_condition = condition
        return self

    def use_lsm(self, flag: bool = True) -> "MergeInsertBuilder":
        """Route this upsert through the WAL instead of a base-table join
        (reference merge.rs use_lsm; requires set_lsm_write_spec)."""
        self._use_lsm = flag
        return self

    def execute(self, new_data: Any, timeout: float | None = None) -> dict:
        source = to_arrow_table(new_data, schema=None)
        if getattr(self, "_use_lsm", False):
            if not (self._update_all and self._insert_all) or self._delete_missing:
                raise InvalidInputError(
                    "LSM merge_insert supports the upsert shape only "
                    "(when_matched_update_all + when_not_matched_insert_all)"
                )
            spec = self._table._lsm.get_spec()
            if spec is None:
                raise InvalidInputError("no LSM spec; call set_lsm_write_spec first")
            if spec.key_columns != self._on:
                raise InvalidInputError(
                    f"merge keys {self._on} must match the LSM spec keys {spec.key_columns}"
                )
            return self._table._lsm.append(source)
        stats = self._table._dataset.merge_insert(
            source,
            on=self._on,
            when_matched_update_all=self._update_all,
            matched_condition=self._update_condition,
            when_not_matched_insert_all=self._insert_all,
            when_not_matched_by_source_delete=self._delete_missing,
            delete_condition=self._delete_condition,
        )
        self._table._invalidate_caches()
        return stats


class _ProgressAdapter:
    """Normalize the reference ``progress=`` forms into the internal
    on_progress event callback: a user callable gets reference-shaped
    dicts (reference test_table.py test_add_progress_callback keys), a
    tqdm-like object gets total/update/set_postfix_str, and ``True``
    builds a bar (tqdm when importable, else a stderr line)."""

    def __init__(self, progress):
        self._t0 = time.time()
        self._rows = 0
        self._bytes = 0
        self._total = None
        self._cb = None
        self._bar = None
        self._own_bar = False
        if progress is True:
            try:
                from tqdm import tqdm  # type: ignore

                self._bar = tqdm(unit="rows")
                self._own_bar = True
            except Exception:
                import sys as _sys

                self._cb = lambda p: print(
                    f"add: {p['output_rows']} rows"
                    + (" done" if p["done"] else ""),
                    file=_sys.stderr,
                )
        elif callable(progress):
            self._cb = progress
        elif hasattr(progress, "update"):
            self._bar = progress
        else:
            raise InvalidInputError(
                "progress must be a callable, a tqdm-like object, or a bool"
            )

    def __call__(self, ev: dict) -> None:
        stage = ev.get("stage")
        rows = int(ev.get("rows", 0))
        nbytes = int(ev.get("bytes", 0))
        if stage == "start":
            self._total = rows
            if self._bar is not None and getattr(self._bar, "total", None) is None:
                try:
                    self._bar.total = rows
                except Exception:
                    pass
            return
        if stage in ("fragment", "committed"):
            self._rows += rows
            self._bytes += nbytes
        done = stage == "committed"
        elapsed = max(time.time() - self._t0, 1e-9)
        if self._cb is not None:
            self._cb({
                "output_rows": self._rows,
                "output_bytes": self._bytes,
                "total_rows": self._total if self._total is not None else self._rows,
                "elapsed_seconds": elapsed,
                "active_tasks": 0 if done else 1,
                "total_tasks": 1,
                "done": done,
            })
        if self._bar is not None:
            if rows:
                self._bar.update(rows)
            if hasattr(self._bar, "set_postfix_str"):
                mbs = self._bytes / elapsed / 1e6
                self._bar.set_postfix_str(f"{mbs:.1f} MB/s, 1 workers")
            if hasattr(self._bar, "refresh"):
                self._bar.refresh()
            if done and self._own_bar and hasattr(self._bar, "close"):
                self._bar.close()


class Table:
    """A handle on one table of a database."""

    def __init__(self, connection, name: str, dataset: Dataset,
                 namespace_path: list[str] | None = None):
        self._conn = connection
        self.name = name
        self._namespace_path = list(namespace_path or [])
        self._Table__dataset = dataset
        self._searchers: dict[str, Any] = {}
        self._fts_indexes: dict[str, Any] = {}
        # serializes read-freshness refresh + cache invalidation between
        # concurrent readers (hybrid search runs its two legs in
        # parallel threads; the QueryServer also shares Table handles)
        self._refresh_lock = threading.Lock()
        self._last_consistency_check = time.monotonic()
        self._embedding_functions: dict[str, Any] = {}
        self._load_embedding_config()
        refresher = getattr(connection, "_refresher", None)
        if refresher is not None:
            refresher.register(self)

    # ------------------------------------------------------------ basics

    @property
    def _dataset(self) -> Dataset:
        interval = getattr(self._conn, "read_consistency_interval", None)
        if interval is not None and not self._Table__dataset.pinned:
            now = time.monotonic()
            if interval == 0 or (now - self._last_consistency_check) >= interval:
                with self._refresh_lock:
                    # re-check under the lock: another reader thread may
                    # have refreshed while this one waited
                    if interval == 0 or (
                        time.monotonic() - self._last_consistency_check
                    ) >= interval:
                        old_version = self._Table__dataset.version
                        self._Table__dataset.checkout_latest()
                        self._last_consistency_check = time.monotonic()
                        if self._Table__dataset.version != old_version:
                            self._invalidate_caches()
        return self._Table__dataset

    # optional write listener (namespace read-freshness: a namespace-
    # opened table bumps its freshness baseline on every mutation —
    # reference database/read_freshness.rs TableFreshness::bump)
    _on_write = None

    def _invalidate_caches(self) -> None:
        self._searchers.clear()
        self._fts_indexes.clear()
        session = getattr(self._conn, "session", None)
        if session is not None:
            session.invalidate(self._Table__dataset.root)
        if self._on_write is not None:
            self._on_write()

    def _background_refresh(self) -> None:
        """Called by the connection's BackgroundRefresher (Eventual
        consistency, reference utils/background_cache.rs)."""
        if self._Table__dataset.pinned:
            return
        with self._refresh_lock:
            old = self._Table__dataset.version
            self._Table__dataset.checkout_latest()
            self._last_consistency_check = time.monotonic()
            if self._Table__dataset.version != old:
                self._invalidate_caches()

    @property
    def namespace(self) -> list[str]:
        """Namespace path of the table (reference table.py:2184)."""
        return self._namespace_path

    @property
    def id(self) -> str:
        """Full identifier ``namespace$name`` (reference table.py:2189)."""
        if self._namespace_path:
            return "$".join(self._namespace_path + [self.name])
        return self.name

    @classmethod
    def open(cls, db, name: str, **kw) -> "Table":
        """Open an existing table through a connection (reference
        LanceTable.open, table.py:2212)."""
        return db.open_table(name, **kw)

    @classmethod
    def create(cls, db, name: str, data=None, schema=None, **kw) -> "Table":
        """Create a table through a connection (reference
        LanceTable.create, table.py:3541)."""
        return db.create_table(name, data, schema, **kw)

    def initial_storage_options(self) -> dict | None:
        """Storage options the connection was opened with (reference
        table.py:3044; internal API)."""
        opts = getattr(self._conn, "storage_options", None)
        return dict(opts) if opts else None

    def latest_storage_options(self) -> dict | None:
        """Refresh storage options from the connection's provider when
        one is configured (credential vending; reference table.py:3059),
        else the initial static options."""
        provider = getattr(self._conn, "storage_options_provider", None)
        if provider is not None:
            fresh = provider()
            if fresh:
                merged = dict(getattr(self._conn, "storage_options", {}) or {})
                merged.update(fresh)
                self._conn.storage_options = merged
                return dict(merged)
        return self.initial_storage_options()

    @property
    def schema(self) -> pa.Schema:
        return self._dataset.schema

    @property
    def version(self) -> int:
        return self._dataset.version

    @property
    def embedding_functions(self) -> dict:
        return self._embedding_functions

    def __repr__(self) -> str:
        return f"Table(name={self.name!r}, version={self.version}, rows={self.count_rows()})"

    def __len__(self) -> int:
        return self.count_rows()

    def count_rows(self, filter: str | None = None) -> int:
        return self._dataset.count_rows(filter)

    def to_arrow(self) -> pa.Table:
        return self._dataset.to_table()

    def to_pandas(self, flatten=None):
        from .arrow import flatten_columns

        return flatten_columns(self.to_arrow(), flatten).to_pandas()

    def to_polars(self):
        import polars as pl

        return pl.from_arrow(self.to_arrow())

    def head(self, n: int = 5) -> pa.Table:
        return self._dataset.to_table(limit=n)

    @property
    def uri(self) -> str:
        """Storage location of the table's dataset."""
        base = getattr(self._conn, "uri", "").rstrip("/")
        return f"{base}/{self.name}.lance" if base else self._Table__dataset.root

    def to_lance(self) -> Dataset:
        """The underlying dataset handle (reference to_lance: escape
        hatch to the storage layer)."""
        return self._dataset

    def prewarm_data(self) -> None:
        """Open every fragment reader ahead of queries (reference
        prewarm_data — pulls data into the cache tier)."""
        ds = self._dataset
        for frag in ds.manifest.fragments:
            ds.reader(frag.id)

    def update_field_metadata(self, field_name: str, new_metadata: dict) -> None:
        """Replace one field's schema metadata (reference
        update_field_metadata, table.py:4042)."""
        self._dataset.update_field_metadata(field_name, new_metadata)
        self._invalidate_caches()

    replace_field_metadata = update_field_metadata  # deprecated reference alias

    def take_offsets(self, offsets: list[int]) -> pa.Table:
        return self._dataset.take_offsets(np.asarray(offsets, dtype=np.int64))

    def take_row_ids(self, row_ids: list[int]) -> pa.Table:
        return self._dataset.take_rows(np.asarray(row_ids, dtype=np.uint64))

    # ------------------------------------------------------------- write

    def add(
        self,
        data: Any,
        mode: Literal["append", "overwrite"] = "append",
        *,
        on_bad_vectors: str = "error",
        fill_value: float = 0.0,
        on_progress=None,
        progress=None,
    ) -> None:
        """on_progress: optional callback(dict) per written batch
        (reference table/write_progress.rs callbacks). progress: the
        reference-shaped knob — a callback receiving {output_rows,
        output_bytes, total_rows, elapsed_seconds, active_tasks,
        total_tasks, done} dicts, a tqdm-like object (update/
        set_postfix_str), or True for an auto bar (reference python
        table.py add(progress=...))."""
        from .blob import blob_columns, encode_blobs

        if progress is not None and progress is not False and on_progress is None:
            on_progress = _ProgressAdapter(progress)

        # streaming ingest: a RecordBatchReader, pyarrow Dataset/Scanner,
        # or batch generator appends fragment-by-fragment in bounded
        # memory, one commit (reference add_data.rs streaming inserts +
        # scannable.py source normalization)
        import types

        import pyarrow.dataset as _pads

        if mode == "append" and isinstance(data, (_pads.Dataset, _pads.Scanner)):
            from .scannable import to_scannable

            data = to_scannable(data).reader()
        if mode == "append" and isinstance(data, (pa.RecordBatchReader, types.GeneratorType)):
            if not self._embedding_functions and not blob_columns(self.schema):
                from .arrow import sanitize_vectors

                def _clean(batches):
                    for b in batches:
                        t = pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
                        yield sanitize_vectors(t, on_bad_vectors, fill_value)

                self._dataset.append_stream(_clean(data), on_batch=on_progress)
                if on_progress is not None:
                    on_progress({"stage": "committed", "rows": 0, "bytes": 0,
                                 "version": self._dataset.version})
                self._invalidate_caches()
                return
            # embedding/blob tables need per-chunk transformation: wrap
            data = (
                pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
                for b in data
            )
            for chunk in data:
                self.add(
                    chunk, mode="append",
                    on_bad_vectors=on_bad_vectors, fill_value=fill_value,
                    on_progress=on_progress,
                )
            return

        bcols = blob_columns(self.schema) if mode == "append" else []
        if bcols:
            # align against an ingest view of the schema where blob
            # descriptor columns accept raw binary payloads
            ingest_fields = []
            for f in self.schema:
                if f.name in bcols:
                    ingest_fields.append(pa.field(f.name, pa.large_binary(), nullable=f.nullable))
                else:
                    ingest_fields.append(f)
            tbl = to_arrow_table(data, schema=pa.schema(ingest_fields))
            ds = self._dataset
            tbl = encode_blobs(ds.store, ds.root, tbl, self.schema)
        else:
            tbl = to_arrow_table(data, schema=self.schema if mode == "append" else None)
        tbl = self._apply_embeddings(tbl)
        from .arrow import sanitize_vectors

        tbl = sanitize_vectors(tbl, on_bad_vectors, fill_value)
        if on_progress is not None:
            on_progress({"stage": "start", "rows": tbl.num_rows, "bytes": tbl.nbytes})
        if mode == "append":
            self._dataset.append(tbl)
        elif mode == "overwrite":
            self._dataset.overwrite(tbl)
        else:
            raise InvalidInputError(f"unknown add mode {mode!r}")
        if on_progress is not None:
            on_progress({
                "stage": "committed", "rows": tbl.num_rows,
                "bytes": tbl.nbytes, "version": self._dataset.version,
            })
        self._invalidate_caches()

    def delete(self, where: str) -> int:
        n = self._dataset.delete(where)
        self._invalidate_caches()
        return n

    def update(
        self,
        where: str | None = None,
        values: dict | None = None,
        *,
        values_sql: dict[str, str] | None = None,
    ) -> dict:
        """Update rows: `values` are python literals, `values_sql` SQL
        expressions (reference table.py update API)."""
        updates: dict[str, str] = {}
        if values:
            for col, val in values.items():
                if isinstance(val, str):
                    updates[col] = "'" + val.replace("'", "''") + "'"
                elif val is None:
                    updates[col] = "NULL"
                elif isinstance(val, bool):
                    updates[col] = "TRUE" if val else "FALSE"
                else:
                    updates[col] = repr(val)
        if values_sql:
            updates.update(values_sql)
        if not updates:
            raise InvalidInputError("update requires values or values_sql")
        stats = self._dataset.update(updates, where=where)
        self._invalidate_caches()
        return stats

    def merge_insert(self, on: str | list[str]) -> MergeInsertBuilder:
        return MergeInsertBuilder(self, on)

    # ---------------------------------------------------------- LSM/WAL

    @property
    def _lsm(self):
        from .lsm import LsmStore

        # cached so the ShardWriter cache survives across merge_insert
        # calls (reference's per-table writer cache, merge/lsm.rs:322-334)
        cached = self.__dict__.get("_lsm_store")
        ds = self._dataset
        if cached is None or cached._ds is not ds:
            cached = self.__dict__["_lsm_store"] = LsmStore(ds)
        return cached

    def set_lsm_write_spec(
        self,
        mode: str = "unsharded",
        key_columns: list[str] | str = (),
        num_shards: int = 1,
        *,
        maintained_indexes: list[str] | None = None,
        writer_config: dict | None = None,
    ) -> None:
        """Install the LSM sharding spec (reference table.rs:379-530);
        ``maintained_indexes=None`` snapshots every current index
        (merge/lsm.rs:134-176)."""
        from .lsm import LsmSpec

        keys = [key_columns] if isinstance(key_columns, str) else list(key_columns)
        self._lsm.set_spec(
            LsmSpec(
                mode, keys, num_shards,
                maintained_indexes=maintained_indexes, writer_config=writer_config,
            )
        )

    def close_lsm_writers(self) -> None:
        """Drain cached shard writers (reference close_lsm_writers)."""
        self._lsm.close_writers()

    def describe_lsm_spec(self) -> dict | None:
        spec = self._lsm.get_spec()
        return spec.to_json() if spec else None

    def get_lsm_write_spec(self) -> dict | None:
        """The installed LSM write spec, or None (reference
        get_lsm_write_spec, table.rs:379-530)."""
        return self.describe_lsm_spec()

    def unset_lsm_write_spec(self, *, force: bool = False) -> None:
        """Remove the LSM write spec (reference unset_lsm_write_spec)."""
        self.drop_lsm_spec(force=force)

    def drop_lsm_spec(self, *, force: bool = False) -> None:
        self._lsm.drop_spec(force=force)

    def flush_lsm(self) -> dict:
        lsm = self._lsm
        out = self._lsm.flush()
        # maintain the spec's index selection over the folded rows —
        # the reference MemWAL keeps maintained indexes fresh on flush
        spec = lsm.get_spec()
        if out.get("rows_flushed") and spec and spec.maintained_indexes:
            out["indexes_refreshed"] = self._reindex_stale(
                only=set(spec.maintained_indexes)
            )
        self._invalidate_caches()
        return out

    def checkpoint_lsm(self, timeout: float = 60.0) -> dict:
        """Seal + flush until converged (reference table/checkpoint.rs)."""
        out = self._lsm.checkpoint(timeout=timeout)
        self._invalidate_caches()
        return out

    def lsm_stats(self) -> dict:
        return self._lsm.stats()

    def get_lsm_stats(self, *, include_generation_rows: bool = False) -> dict | None:
        """Reference-named stats accessor: None when LSM is not enabled."""
        s = self._lsm.stats()
        return s if s.get("enabled") else None

    def compact_lsm(self):
        """Dispatch one seal+fold pass in the background (reference
        compact_lsm: returns once dispatched — watch lsm_stats or use
        checkpoint_lsm to wait for convergence). Returns the Job."""
        return self._conn._jobs.submit("compact_lsm", self.flush_lsm)

    # ------------------------------------------------------------ search

    def search(
        self,
        query: Any = None,
        vector_column_name: str | None = None,
        query_type: str = "auto",
        fts_columns: list[str] | None = None,
    ) -> LanceQueryBuilder:
        """Entry point for vector / FTS / hybrid search (reference
        table.py:3404 → LanceQueryBuilder.create)."""
        return LanceQueryBuilder.create(
            self, query, query_type=query_type,
            vector_column_name=vector_column_name, fts_columns=fts_columns,
        )

    def vector_search(self, vector) -> LanceVectorQueryBuilder:
        return LanceVectorQueryBuilder(self, vector, None)

    def query(self) -> LanceEmptyQueryBuilder:
        return LanceEmptyQueryBuilder(self)

    _serving_mesh = None

    def enable_sharded_serving(self, mesh=None) -> None:
        """Serve this table's IVF_PQ index across a device mesh: probed
        scans shard over the mesh (per-device top-k, all_gather merge
        over ICI — parallel/serving.py). Prefiltered and deletion-masked
        queries fan out too: each shard adds its slice of the slot
        penalty before the scan. ``mesh=None`` builds a 1-D mesh over
        all devices. Call again after index rebuilds (caches invalidate
        automatically on writes)."""
        if mesh is None:
            from .parallel.mesh import make_mesh

            mesh = make_mesh()
        self._serving_mesh = mesh
        self._searchers.clear()

    def disable_sharded_serving(self) -> None:
        self._serving_mesh = None
        self._searchers.clear()

    def _get_searcher(self, index_meta):
        from .index.vector import load_searcher

        key = index_meta.uuid
        ds = self._dataset
        session = getattr(self._conn, "session", None)

        def load_single():
            if session is not None:
                return session.get_or_load(
                    f"{ds.root}/{key}", lambda: load_searcher(ds, index_meta)
                )
            return load_searcher(ds, index_meta)

        # read-then-assign (never re-read the dict): concurrent cache
        # invalidation between check and return must not KeyError
        if self._serving_mesh is not None and index_meta.index_type == "IVF_PQ":
            skey = f"sharded:{key}"
            s = self._searchers.get(skey)
            if s is None:
                from .parallel.serving import make_sharded_searcher

                try:
                    s = make_sharded_searcher(
                        self._serving_mesh, ds, index_meta, load_single
                    )
                except InvalidInputError:
                    # metric/type the sharded kernel doesn't serve:
                    # correct single-device results beat a mesh
                    s = load_single()
                self._searchers[skey] = s
            return s
        s = self._searchers.get(key)
        if s is None:
            s = load_single()
            self._searchers[key] = s
        return s

    def _embed_query(self, text: str, vector_column_name: str | None):
        col = vector_column_name or self._default_vector_column()
        fn = self._embedding_functions.get(col)
        if fn is None:
            raise InvalidInputError(
                f"cannot embed text query: no embedding function registered for "
                f"column {col!r}; pass a vector instead"
            )
        return np.asarray(fn.compute_query_embeddings(text)[0], dtype=np.float32)

    def _default_vector_column(self) -> str:
        return vector_column_name(self.schema)

    # ------------------------------------------------------------- index

    def create_index(
        self,
        metric: str = "l2",
        num_partitions: int | None = None,
        num_sub_vectors: int | None = None,
        vector_column_name: str | None = None,
        replace: bool = True,
        index_type: str = "IVF_PQ",
        num_bits: int = 8,
        sample_rate: int = 256,
        max_iterations: int = 50,
        *,
        config: IndexConfig | None = None,
        name: str | None = None,
        accelerator: str | None = None,
    ) -> None:
        """Build a vector index (reference table.py:2604 create_index /
        rust IndexBuilder).

        ``accelerator`` is accepted for reference compatibility
        (table.py:2757 dispatches GPU builds to pylance there) and
        ignored: every build here already runs on the TPU."""
        from .index.multivector import build_multivector_index, is_multivector_type
        from .index.vector import build_vector_index

        column = vector_column_name or self._default_vector_column()
        if (config is not None and config.index_type == "AUTO") or (
            config is None and index_type.upper() == "AUTO"
        ):
            # Index::Auto resolution (reference table/create_index.rs:186-213):
            # vector column -> IVF_PQ defaults, btree-supported scalar -> BTREE.
            if config is not None:
                metric = config.distance_type
            config = None
            field_type = self.schema.field(column).type
            if _is_vector_type(field_type) or is_multivector_type(field_type):
                index_type = "IVF_PQ"
            elif _supported_btree_type(field_type):
                self.create_scalar_index(column, index_type="BTREE", replace=replace)
                return
            else:
                raise InvalidInputError(
                    f"there are no indices supported for the field {column!r} "
                    f"with the data type {field_type}"
                )
        if column in self.schema.names and is_multivector_type(self.schema.field(column).type):
            meta = build_multivector_index(self._dataset, column, config, name=name or f"{column}_idx")
            self._dataset.add_index(meta, replace=replace)
            self._invalidate_caches()
            return
        if config is None:
            it = index_type.upper()
            if it == "IVF_PQ":
                config = IvfPq(
                    distance_type=metric,
                    num_partitions=num_partitions,
                    num_sub_vectors=num_sub_vectors,
                    num_bits=num_bits,
                    sample_rate=sample_rate,
                    max_iterations=max_iterations,
                )
            elif it == "IVF_FLAT":
                config = IvfFlat(
                    distance_type=metric,
                    num_partitions=num_partitions,
                    sample_rate=sample_rate,
                    max_iterations=max_iterations,
                )
            elif it == "IVF_SQ":
                config = IvfSq(
                    distance_type=metric,
                    num_partitions=num_partitions,
                    sample_rate=sample_rate,
                    max_iterations=max_iterations,
                )
            elif it == "IVF_RQ":
                from .index import IvfRq

                config = IvfRq(
                    distance_type=metric,
                    num_partitions=num_partitions,
                    sample_rate=sample_rate,
                    max_iterations=max_iterations,
                )
            elif it == "FLAT":
                config = Flat(distance_type=metric)
            elif it in ("IVF_HNSW_FLAT", "IVF_HNSW_SQ", "IVF_HNSW_PQ"):
                from .index import HnswFlat, HnswPq, HnswSq

                cls = {"IVF_HNSW_FLAT": HnswFlat, "IVF_HNSW_SQ": HnswSq, "IVF_HNSW_PQ": HnswPq}[it]
                kwargs = dict(distance_type=metric, num_partitions=num_partitions)
                if it == "IVF_HNSW_PQ":
                    kwargs["num_sub_vectors"] = num_sub_vectors
                config = cls(**kwargs)
            else:
                raise InvalidInputError(f"unsupported index_type {index_type!r}")
        if config.index_type.startswith("IVF_HNSW"):
            from .index.hnsw import build_hnsw_index

            meta = build_hnsw_index(self._dataset, column, config, name=name or f"{column}_idx")
        else:
            meta = build_vector_index(
                self._dataset, column, config, name=name or f"{column}_idx"
            )
        self._dataset.add_index(meta, replace=replace)
        self._invalidate_caches()

    def create_index_async(self, **kwargs):
        """Background index build returning a Job handle (reference
        index.rs:313 create_index_async → Job)."""
        return self._conn._jobs.submit(
            "create_index", lambda: self.create_index(**kwargs)
        )

    def create_scalar_index(
        self,
        column: str,
        *,
        index_type: str = "BTREE",
        replace: bool = True,
        config: IndexConfig | None = None,
    ) -> None:
        from .index.scalar import build_scalar_index

        if config is None:
            it = index_type.upper()
            from .index import Fm

            config = {"BTREE": BTree, "BITMAP": Bitmap, "LABEL_LIST": LabelList, "FM": Fm}.get(it)
            if config is None:
                raise InvalidInputError(f"unknown scalar index type {index_type!r}")
            config = config()
        meta = build_scalar_index(self._dataset, column, config)
        self._dataset.add_index(meta, replace=replace)

    @staticmethod
    def infer_tokenizer_configs(tokenizer_name: str) -> dict:
        """Expand a lance-style tokenizer shorthand ("default", "raw",
        "whitespace", "ngram", "<language>_stem") into the full FTS
        tokenizer kwargs (reference table.py:3205)."""
        base = {
            "base_tokenizer": "simple",
            "language": "English",
            "max_token_length": 40,
            "lower_case": True,
            "stem": False,
            "remove_stop_words": False,
            "ascii_folding": False,
            "ngram_min_length": 3,
            "ngram_max_length": 3,
            "prefix_only": False,
        }
        if tokenizer_name == "default":
            return base
        if tokenizer_name in ("raw", "whitespace"):
            return {**base, "base_tokenizer": tokenizer_name,
                    "max_token_length": None, "lower_case": False}
        if tokenizer_name == "ngram":
            return {**base, "base_tokenizer": "ngram"}
        if tokenizer_name.endswith("_stem"):
            code = tokenizer_name[: -len("_stem")].lower()
            iso = {
                "en": "English", "fr": "French", "de": "German",
                "es": "Spanish", "it": "Italian", "pt": "Portuguese",
            }
            return {
                **base, "stem": True,
                "language": iso.get(code, code.capitalize()),
            }
        raise InvalidInputError(f"unknown tokenizer name {tokenizer_name!r}")

    def create_fts_index(
        self,
        field_names: str | list[str],
        *,
        replace: bool = True,
        with_position: bool = True,
        tokenizer_name: str | None = None,
        base_tokenizer: str = "simple",
        language: str = "English",
        max_token_length: int | None = 40,
        lower_case: bool = True,
        stem: bool = True,
        remove_stop_words: bool = True,
        ascii_folding: bool = True,
        ngram_min_length: int = 3,
        ngram_max_length: int = 3,
        prefix_only: bool = False,
        dict_path: str | None = None,
    ) -> None:
        """Build the BM25 inverted index (reference table.py:3111).

        ``dict_path``: user dictionary for the jieba/lindera
        dictionary-backed CJK tokenizers ('word [freq [tag]]' lines).
        """
        from .index.fts import build_fts_index

        fields = [field_names] if isinstance(field_names, str) else list(field_names)
        if tokenizer_name is not None:
            cfgs = self.infer_tokenizer_configs(tokenizer_name)
            base_tokenizer = cfgs["base_tokenizer"]
            language = cfgs["language"]
            max_token_length = cfgs["max_token_length"]
            lower_case = cfgs["lower_case"]
            stem = cfgs["stem"]
            remove_stop_words = cfgs["remove_stop_words"]
            ascii_folding = cfgs["ascii_folding"]
        config = FTS(
            with_position=with_position,
            base_tokenizer=base_tokenizer,  # type: ignore[arg-type]
            language=language,
            max_token_length=max_token_length,
            lower_case=lower_case,
            stem=stem,
            remove_stop_words=remove_stop_words,
            ascii_folding=ascii_folding,
            ngram_min_length=ngram_min_length,
            ngram_max_length=ngram_max_length,
            prefix_only=prefix_only,
            dict_path=dict_path,
        )
        meta = build_fts_index(self._dataset, fields, config)
        self._dataset.add_index(meta, replace=replace)
        self._invalidate_caches()

    def list_indices(self) -> list[dict]:
        return [
            {
                "name": ix.name,
                "index_type": ix.index_type,
                "columns": list(ix.columns),
            }
            for ix in self._dataset.manifest.indices
        ]

    def index_stats(self, index_name: str) -> dict | None:
        ix = self._dataset.manifest.index_by_name(index_name)
        if ix is None:
            return None
        covered = set(ix.fragment_ids)
        unindexed = sum(
            f.num_rows for f in self._dataset.manifest.fragments if f.id not in covered
        )
        return {
            "num_indexed_rows": ix.num_indexed_rows,
            "num_unindexed_rows": unindexed,
            "index_type": ix.index_type,
            "distance_type": ix.params.get("metric"),
            "num_indices": 1,
            # index-specific build params (reference IndexStatistics
            # carries the index config; only JSON-scalar fields)
            "params": {
                k: v
                for k, v in ix.params.items()
                if isinstance(v, (str, int, float, bool)) and k not in ("metric",)
            },
        }

    def drop_index(self, name: str) -> None:
        self._dataset.drop_index(name)
        self._invalidate_caches()

    def prewarm_index(self, name: str) -> None:
        """Load index artifacts onto the device ahead of queries."""
        ix = self._dataset.manifest.index_by_name(name)
        if ix is None:
            raise IndexNotFoundError(name)
        if ix.index_type in VECTOR_INDEX_TYPES:
            self._get_searcher(ix)
        elif ix.index_type == "FTS":
            self._get_fts_index(ix)

    def wait_for_index(self, index_names: list[str], timeout: float = 300.0) -> None:
        """Poll until indexes exist (reference index/waiter.rs:16). Local
        builds are synchronous so this returns immediately unless absent."""
        deadline = time.monotonic() + timeout
        names = set(index_names)
        while time.monotonic() < deadline:
            present = {ix.name for ix in self._dataset.manifest.indices}
            if names <= present:
                return
            time.sleep(0.1)
        raise TimeoutError(f"indexes {names} not ready after {timeout}s")

    # --------------------------------------------------------------- fts

    def _get_fts_index(self, meta):
        from .index.fts import load_fts_index

        if meta.uuid not in self._fts_indexes:
            self._fts_indexes[meta.uuid] = load_fts_index(self._dataset, meta)
        return self._fts_indexes[meta.uuid]

    def tokenize(
        self, query: str, *, column: str | None = None, index_name: str | None = None
    ) -> list["FtsToken"]:
        """Tokenize a query with the tokenizer configured on an FTS
        index (reference table.py:1884). Specify at most one of
        ``column`` / ``index_name``; with neither, the table's single
        FTS index is used."""
        if column is not None and index_name is not None:
            raise InvalidInputError("specify only one of column / index_name")
        chosen = None
        for ix in self._dataset.manifest.indices:
            if ix.index_type != "FTS":
                continue
            if index_name is not None and ix.name != index_name:
                continue
            if column is not None and column not in ix.columns:
                continue
            chosen = ix
            break
        if chosen is None:
            raise InvalidInputError("no matching FTS index to tokenize with")
        fts = self._get_fts_index(chosen)
        tok = fts.tokenizer
        return [FtsToken(text=t, position=i) for i, t in enumerate(tok.tokenize(query))]

    @property
    def blob_columns(self) -> list[str]:
        """Columns stored as out-of-line blobs (reference blob_columns)."""
        from .blob import blob_columns as _bc

        return _bc(self.schema)

    @property
    def branches(self) -> dict:
        """Branch heads (reference Table.branches)."""
        return self.list_branches()

    def merge(self, other_table, left_on: str, right_on: str | None = None,
              schema=None) -> None:
        """Left-join another table's columns onto this one (reference
        LanceTable.merge, table.py:3324). ``other_table`` may be a
        Table or any ingestible data; rows without a match fill null."""
        if isinstance(other_table, Table):
            other = other_table.search(None).limit(None).to_arrow()
        else:
            other = to_arrow_table(other_table, schema=schema)
        self._dataset.merge(other, left_on, right_on)
        self._invalidate_caches()

    def set_unenforced_primary_key(self, columns: list[str] | str) -> None:
        """Alias of declare_primary_key (reference
        set_unenforced_primary_key, table.rs:673 — the key is declared,
        not enforced)."""
        self.declare_primary_key(columns)

    def replace_field_metadata(self, field_name: str, new_metadata: dict) -> None:
        """Alias of update_field_metadata (reference
        replace_field_metadata)."""
        self.update_field_metadata(field_name, new_metadata)

    def migrate_v2_manifest_paths(self) -> None:
        """No-op for parity (reference migrate_v2_manifest_paths): this
        engine has a single manifest path scheme — there is no v1→v2
        layout to migrate."""
        return None

    def _execute_fts(
        self,
        query,
        columns=None,
        k: int = DEFAULT_TOP_K,
        offset: int = 0,
        filter: str | None = None,
        prefilter: bool = True,
        select=None,
        with_row_id: bool = False,
    ) -> pa.Table:
        from .index.fts import execute_fts_query

        return execute_fts_query(
            self,
            query,
            columns=columns,
            k=k,
            offset=offset,
            filter=filter,
            prefilter=prefilter,
            select=select,
            with_row_id=with_row_id,
        )

    # -------------------------------------------------- schema evolution

    def add_columns(self, transforms: dict[str, str]) -> None:
        self._dataset.add_columns(transforms)
        self._invalidate_caches()

    def alter_columns(self, *alterations: dict) -> None:
        self._dataset.alter_columns(*alterations)
        self._invalidate_caches()

    def drop_columns(self, columns: list[str]) -> None:
        self._dataset.drop_columns(columns)
        self._invalidate_caches()

    # ------------------------------------------------------- time travel

    def list_versions(self) -> list[dict]:
        return [v.to_dict() for v in self._dataset.list_versions()]

    def checkout(self, version: int | str) -> None:
        if isinstance(version, str):
            self._dataset.checkout_tag(version)
        else:
            self._dataset.checkout(version)
        self._invalidate_caches()

    def checkout_latest(self) -> None:
        self._dataset.checkout_latest()
        self._invalidate_caches()

    def restore(self, version: int | None = None) -> None:
        if version is not None:
            self.checkout(version)
        self._dataset.restore()
        self._invalidate_caches()

    @property
    def tags(self) -> Tags:
        return Tags(self)

    # ---------------------------------------------------------- branches

    def create_branch(self, name: str, version: int | None = None) -> None:
        self._dataset.create_branch(name, version)

    def checkout_branch(self, name: str) -> None:
        self._dataset.checkout_branch(name)
        self._invalidate_caches()

    def list_branches(self) -> dict:
        return self._dataset.list_branches()

    def delete_branch(self, name: str) -> None:
        self._dataset.delete_branch(name)

    def diff_branch(self, name: str) -> dict:
        return self._dataset.diff_branch(name)

    def merge_branch(self, name: str) -> dict:
        out = self._dataset.merge_branch(name)
        self._invalidate_caches()
        return out

    # ------------------------------------------------------- primary key

    def declare_primary_key(self, columns: list[str] | str) -> None:
        """Unenforced primary-key declaration (reference
        table/primary_key.rs, table.rs:673) — recorded in table config,
        used as the default merge/LSM key."""
        cols = [columns] if isinstance(columns, str) else list(columns)
        for c in cols:
            if c not in self.schema.names:
                raise InvalidInputError(f"unknown column {c!r}")
        ds = self._dataset

        def build(current):
            draft = current.child("declare_primary_key", columns=cols)
            draft.config["primary_key"] = cols
            return draft

        ds._commit_with_rebase(build)

    @property
    def primary_key(self) -> list[str] | None:
        return self._dataset.manifest.config.get("primary_key")

    @property
    def current_branch(self) -> str:
        return self._dataset.branch

    # ---------------------------------------------------------- optimize

    def optimize(
        self,
        cleanup_older_than: float | None = None,
        delete_unverified: bool = False,
        retrain: bool = False,
    ) -> dict:
        """Compact fragments, prune versions, refresh stale indexes
        (reference OptimizeAction::All, table/optimize.rs:30-75)."""
        compact = self._dataset.compact_files()
        rebuilt = self._reindex_stale(retrain=retrain)
        prune = {}
        if cleanup_older_than is not None:
            prune = self._dataset.prune_versions(
                keep_latest=1, older_than_seconds=cleanup_older_than
            )
        self._invalidate_caches()
        return {"compaction": compact, "prune": prune, "indices_rebuilt": rebuilt}

    def _reindex_stale(self, retrain: bool = False, only: set | None = None) -> int:
        """Rebuild indexes whose fragment coverage went stale (the delta
        merge of reference optimize index). ``only`` restricts to the
        named indexes (LSM maintained-index selection)."""
        from .index.fts import build_fts_index
        from .index.scalar import build_scalar_index
        from .index.vector import build_vector_index
        from .index import FTS as FTSConfig

        ds = self._dataset
        live = {f.id for f in ds.manifest.fragments}
        rebuilt = 0
        for ix in list(ds.manifest.indices):
            if only is not None and ix.name not in only:
                continue
            if set(ix.fragment_ids) == live:
                continue
            rebuilt += 1
            if ix.index_type in VECTOR_INDEX_TYPES:
                cfg = _config_from_params(ix.index_type, ix.params)
                meta = build_vector_index(ds, ix.columns[0], cfg, name=ix.name)
            elif ix.index_type == "FTS":
                cfg = FTSConfig(**{
                    k: v for k, v in ix.params.items()
                    if k in FTSConfig.__dataclass_fields__ and k != "index_type"
                })
                meta = build_fts_index(ds, ix.columns, cfg, name=ix.name)
            elif ix.index_type in SCALAR_INDEX_TYPES:
                from .index import (
                    BTree as BTreeCfg,
                    Bitmap as BitmapCfg,
                    Fm as FmCfg,
                    LabelList as LLCfg,
                )

                cfg = {"BTREE": BTreeCfg, "BITMAP": BitmapCfg, "LABEL_LIST": LLCfg,
                       "FM": FmCfg}[ix.index_type]()
                meta = build_scalar_index(ds, ix.columns[0], cfg, name=ix.name)
            else:
                continue
            ds.add_index(meta, replace=True)
        return rebuilt

    def compact_files(self) -> dict:
        out = self._dataset.compact_files()
        self._invalidate_caches()
        return out

    def cleanup_old_versions(self, older_than_seconds: float = 0.0, delete_unverified: bool = False) -> dict:
        return self._dataset.prune_versions(keep_latest=1, older_than_seconds=older_than_seconds)

    def stats(self) -> dict:
        return self._dataset.stats()

    # ------------------------------------------------------------- blobs

    def fetch_blobs(self, column: str, row_ids: list[int]) -> list[bytes | None]:
        """Materialize blob payloads by row address (reference
        table.rs:744 fetch_blobs)."""
        from .blob import fetch_blobs

        return fetch_blobs(self._dataset, column, np.asarray(row_ids, dtype=np.uint64))

    def fetch_blob_files(self, column: str, row_ids: list[int]):
        """Lazy seekable BlobFile handles (reference fetch_blob_files)."""
        from .blob import fetch_blob_files

        return fetch_blob_files(self._dataset, column, np.asarray(row_ids, dtype=np.uint64))

    def fetch_blob_ranges(self, column: str, row_ids: list[int], ranges: list[tuple[int, int]]):
        from .blob import fetch_blob_ranges

        return fetch_blob_ranges(
            self._dataset, column, np.asarray(row_ids, dtype=np.uint64), ranges
        )

    # -------------------------------------------------------- embeddings

    def _load_embedding_config(self) -> None:
        import json

        meta = self._Table__dataset.schema.metadata or {}
        raw = meta.get(b"embedding_functions")
        if not raw:
            return
        from .embeddings.registry import EmbeddingFunctionRegistry

        registry = EmbeddingFunctionRegistry.get_instance()
        try:
            self._embedding_functions = registry.parse_functions_from_schema_metadata(raw)
        except Exception:
            self._embedding_functions = {}

    def _apply_embeddings(self, tbl: pa.Table) -> pa.Table:
        """Compute missing vector columns from configured source columns
        (reference WithEmbeddings wrapper, embeddings.rs:130)."""
        for vec_col, fn in self._embedding_functions.items():
            field_idx = tbl.schema.get_field_index(vec_col) if vec_col in tbl.schema.names else -1
            needs = (
                vec_col not in tbl.schema.names
                or tbl.column(vec_col).null_count == tbl.num_rows
            )
            if not needs:
                continue
            src = fn.source_column
            if src not in tbl.schema.names:
                continue
            texts = tbl.column(src).to_pylist()
            embedded = fn.compute_source_embeddings(texts)
            if isinstance(embedded, list) and embedded and np.asarray(embedded[0]).ndim == 2:
                # multi-vector provider (colpali family): ragged bags of
                # (n_vectors, dim) -> list<fixed_size_list<float32, dim>>
                dim = int(np.asarray(embedded[0]).shape[1])
                inner = pa.list_(pa.float32(), dim)
                arr = pa.array(
                    [np.asarray(bag, dtype=np.float32).tolist() for bag in embedded],
                    type=pa.list_(inner),
                )
            else:
                vecs = np.asarray(embedded, dtype=np.float32)
                arr = pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.ravel(), type=pa.float32()), vecs.shape[1]
                )
            if field_idx >= 0:
                tbl = tbl.set_column(field_idx, tbl.schema.field(field_idx).name, arr)
            else:
                tbl = tbl.append_column(vec_col, arr)
        return tbl


def _config_from_params(index_type: str, params: dict):
    common = dict(
        distance_type=params.get("metric", "l2"),
        num_partitions=params.get("num_partitions"),
    )
    if index_type == "IVF_PQ":
        return IvfPq(
            **common,
            num_sub_vectors=params.get("num_sub_vectors"),
            num_bits=params.get("num_bits", 8),
        )
    if index_type == "IVF_FLAT":
        return IvfFlat(**common)
    if index_type == "IVF_SQ":
        return IvfSq(**common)
    if index_type == "IVF_RQ":
        from .index import IvfRq

        return IvfRq(**common)
    return Flat(distance_type=params.get("metric", "l2"))


class AsyncTable:
    """Async facade over Table (reference AsyncTable, table.py:4511).

    Blocking work runs on the shared bounded lancedb-aio executor (not
    the unbounded default pool); queries return async builders whose
    ``to_batches`` streams with backpressure (aio.py module docs)."""

    def __init__(self, table: Table):
        self._t = table

    @property
    def name(self) -> str:
        return self._t.name

    @property
    def namespace(self) -> list[str]:
        return self._t.namespace

    @property
    def id(self) -> str:
        return self._t.id

    async def initial_storage_options(self) -> dict | None:
        """Reference AsyncTable.initial_storage_options (table.py:5171)."""
        return self._t.initial_storage_options()

    async def latest_storage_options(self) -> dict | None:
        """Reference AsyncTable.latest_storage_options (table.py:5186)."""
        return await self._run(self._t.latest_storage_options)

    async def _run(self, fn, *args, **kwargs):
        from .aio import _run

        return await _run(fn, *args, **kwargs)

    # ---- async query builders (reference AsyncTable.query/search) -------
    def query(self):
        from .aio import AsyncQueryBase

        return AsyncQueryBase(self._t.query())

    def search(self, query: Any = None, vector_column_name: str | None = None,
               query_type: str = "auto", fts_columns: list[str] | None = None):
        from .aio import AsyncFTSQuery, AsyncHybridQuery, AsyncQueryBase, AsyncVectorQuery

        b = self._t.search(query, vector_column_name, query_type, fts_columns)
        wrap = {
            "LanceVectorQueryBuilder": AsyncVectorQuery,
            "LanceFtsQueryBuilder": AsyncFTSQuery,
            "LanceHybridQueryBuilder": AsyncHybridQuery,
        }.get(type(b).__name__, AsyncQueryBase)
        return wrap(b)

    async def schema(self) -> pa.Schema:
        return await self._run(lambda: self._t.schema)

    async def count_rows(self, filter: str | None = None) -> int:
        return await self._run(self._t.count_rows, filter)

    async def add(self, data, mode: str = "append") -> None:
        return await self._run(self._t.add, data, mode)

    async def delete(self, where: str) -> int:
        return await self._run(self._t.delete, where)

    async def update(self, where: str | None = None, values: dict | None = None, **kw):
        return await self._run(lambda: self._t.update(where, values, **kw))

    async def create_index(self, **kwargs) -> None:
        return await self._run(lambda: self._t.create_index(**kwargs))

    async def query_arrow(self, builder_fn) -> pa.Table:
        """Run `builder_fn(sync_table) -> builder` and execute it."""
        return await self._run(lambda: builder_fn(self._t).to_arrow())

    async def to_arrow(self) -> pa.Table:
        return await self._run(self._t.to_arrow)

    async def vector_search(self, vector, **kwargs) -> pa.Table:
        def run():
            b = self._t.vector_search(vector)
            for k, v in kwargs.items():
                getattr(b, k)(v)
            return b.to_arrow()

        return await self._run(run)

    async def list_indices(self):
        return await self._run(self._t.list_indices)

    async def version(self) -> int:
        return await self._run(lambda: self._t.version)

    async def checkout(self, version) -> None:
        return await self._run(self._t.checkout, version)

    async def checkout_latest(self) -> None:
        return await self._run(self._t.checkout_latest)

    async def optimize(self, **kw) -> dict:
        return await self._run(lambda: self._t.optimize(**kw))

    # ---- remaining BaseTable surface (reference AsyncTable parity) ------
    async def create_scalar_index(self, column: str, **kw) -> None:
        return await self._run(lambda: self._t.create_scalar_index(column, **kw))

    async def create_fts_index(self, field_names, **kw) -> None:
        return await self._run(lambda: self._t.create_fts_index(field_names, **kw))

    async def drop_index(self, name: str) -> None:
        return await self._run(self._t.drop_index, name)

    async def index_stats(self, name: str) -> dict:
        return await self._run(self._t.index_stats, name)

    async def stats(self) -> dict:
        return await self._run(self._t.stats)

    async def merge_insert(self, on, data, *, when_matched_update_all: bool = True,
                           when_not_matched_insert_all: bool = True) -> dict:
        def run():
            b = self._t.merge_insert(on)
            if when_matched_update_all:
                b.when_matched_update_all()
            if when_not_matched_insert_all:
                b.when_not_matched_insert_all()
            return b.execute(data)

        return await self._run(run)

    async def restore(self, version: int | None = None) -> None:
        return await self._run(lambda: self._t.restore(version))

    async def list_versions(self) -> list[dict]:
        return await self._run(self._t.list_versions)

    async def add_columns(self, transforms: dict) -> None:
        return await self._run(self._t.add_columns, transforms)

    async def alter_columns(self, *alterations) -> None:
        return await self._run(lambda: self._t.alter_columns(*alterations))

    async def drop_columns(self, columns) -> None:
        return await self._run(self._t.drop_columns, columns)

    async def wait_for_index(self, names, timeout: float = 30.0) -> None:
        return await self._run(lambda: self._t.wait_for_index(names, timeout=timeout))

    async def tokenize(self, query: str, *, column=None, index_name=None):
        return await self._run(
            lambda: self._t.tokenize(query, column=column, index_name=index_name)
        )

    async def blob_columns(self) -> list[str]:
        return await self._run(lambda: self._t.blob_columns)

    async def fetch_blobs(self, column: str, row_ids) -> list:
        return await self._run(self._t.fetch_blobs, column, row_ids)

    async def fetch_blob_files(self, column: str, row_ids) -> list:
        return await self._run(self._t.fetch_blob_files, column, row_ids)

    async def fetch_blob_ranges(self, column: str, row_ids, ranges) -> list:
        return await self._run(self._t.fetch_blob_ranges, column, row_ids, ranges)

    @property
    def tags(self):
        """Async tags facade (reference AsyncTable.tags: list/create/
        delete/update run on the executor)."""
        run, sync_tags = self._run, self._t.tags

        class _AsyncTags:
            async def list(self):
                return await run(sync_tags.list)

            async def create(self, tag, version=None):
                return await run(sync_tags.create, tag, version)

            async def delete(self, tag):
                return await run(sync_tags.delete, tag)

            async def update(self, tag, version):
                return await run(sync_tags.update, tag, version)

        return _AsyncTags()

    async def create_branch(self, name: str, version: int | None = None) -> None:
        return await self._run(self._t.create_branch, name, version)

    async def checkout_branch(self, name: str) -> None:
        return await self._run(self._t.checkout_branch, name)

    async def prewarm_index(self, name: str) -> None:
        return await self._run(self._t.prewarm_index, name)

    async def branches(self) -> dict:
        return await self._run(self._t.list_branches)

    async def get_lsm_write_spec(self):
        return await self._run(self._t.get_lsm_write_spec)

    async def unset_lsm_write_spec(self, *, force: bool = False) -> None:
        return await self._run(lambda: self._t.unset_lsm_write_spec(force=force))

    async def set_unenforced_primary_key(self, columns) -> None:
        return await self._run(self._t.declare_primary_key, columns)

    async def replace_field_metadata(self, field_name: str, new_metadata: dict) -> None:
        return await self._run(self._t.update_field_metadata, field_name, new_metadata)

    async def migrate_manifest_paths_v2(self) -> None:
        """No-op parity shim — single manifest path scheme."""
        return None

    def close(self) -> None:
        """Release cached searchers/indexes (reference AsyncTable.close)."""
        self._t._invalidate_caches()
        self._closed = True

    def is_open(self) -> bool:
        return not getattr(self, "_closed", False)

    async def uses_v2_manifest_paths(self) -> bool:  # parity shim
        return True
