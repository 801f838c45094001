"""Database connections: URI routing, table CRUD.

Mirrors reference `connect()` → `Connection` (rust connection.rs:
376-649, python db.py `LanceDBConnection`): a database is a directory
of `<name>.lance` table datasets on an object store (reference
ListingDatabase, database/listing.rs:42).
"""

from __future__ import annotations

import asyncio
from typing import Any

import pyarrow as pa

from .arrow import to_arrow_table
from .errors import InvalidInputError, TableAlreadyExistsError, TableNotFoundError
from .io.object_store import ObjectStore, resolve_uri
from .storage.dataset import Dataset
from .storage.manifest import VERSIONS_DIR
from .table import AsyncTable, Table

TABLE_SUFFIX = ".lance"


class DBConnection:
    """Abstract connection (reference python db.py:79)."""

    def table_names(self, page_token: str | None = None, limit: int | None = None) -> list[str]:
        raise NotImplementedError

    def create_table(self, name: str, data=None, schema=None, mode: str = "create", **kw) -> Table:
        raise NotImplementedError

    def open_table(self, name: str, **kw) -> Table:
        raise NotImplementedError

    def drop_table(self, name: str) -> None:
        raise NotImplementedError

    def rename_table(self, old: str, new: str) -> None:
        raise NotImplementedError

    def drop_all_tables(self) -> None:
        for n in self.table_names():
            self.drop_table(n)

    def sql(self, query: str):
        """Execute a SQL SELECT over this database's tables.

        Supports projection/aggregation/GROUP BY/HAVING/ORDER BY/LIMIT,
        sub-selects, and the ``fts(table, 'query' [, k])`` table
        function — the surface the reference provides through DataFusion
        (reference rust/lancedb/src/table/datafusion.rs:37-44, udtf
        fts.rs:16-51). Returns a pyarrow Table.

        ``EXPLAIN SELECT ...`` returns the physical plan without
        executing; ``EXPLAIN ANALYZE SELECT ...`` executes and annotates
        each operator with DataFusion-style metrics (both return a
        (plan_type, plan) table, matching DataFusion's EXPLAIN shape).
        """
        import pyarrow as pa

        from .sql import analyze_select, execute_select, explain_select

        stripped = query.lstrip()
        head = stripped[:16].upper()
        if head.startswith("EXPLAIN"):
            rest = stripped[7:].lstrip()
            if rest[:7].upper() == "ANALYZE":
                plan, _ = analyze_select(rest[7:].lstrip(), self.open_table)
                return pa.table(
                    {"plan_type": ["Plan with Metrics"], "plan": [plan]}
                )
            return pa.table(
                {"plan_type": ["physical_plan"], "plan": [explain_select(rest)]}
            )
        return execute_select(query, self.open_table)

    # deprecated alias kept for reference-parity
    def drop_database(self) -> None:
        self.drop_all_tables()


class LanceDBConnection(DBConnection):
    def __init__(
        self,
        uri: str,
        *,
        read_consistency_interval: float | None = None,
        storage_options: dict | None = None,
        store: ObjectStore | None = None,
        session=None,
        storage_options_provider=None,
    ):
        self.uri = uri
        self.read_consistency_interval = read_consistency_interval
        self.storage_options = storage_options or {}
        # optional zero-arg callable returning refreshed storage options
        # (credential vending; reference table.py latest_storage_options)
        self.storage_options_provider = storage_options_provider
        from .session import BackgroundRefresher, Session

        self.session = session or Session()
        self._refresher = (
            BackgroundRefresher(read_consistency_interval)
            if read_consistency_interval and read_consistency_interval > 0
            else None
        )
        if store is not None:
            self._store, self._root = store, uri
        else:
            self._store, self._root = resolve_uri(uri, storage_options)
        from .jobs import JobRegistry

        self._jobs = JobRegistry()

    def __repr__(self) -> str:
        return f"LanceDBConnection(uri={self.uri!r})"

    # ---- container / lifecycle dunders (reference db.py) ---------------
    def __contains__(self, name: str) -> bool:
        return self.table_exists(name)

    def __getitem__(self, name: str) -> "Table":
        return self.open_table(name)

    def __len__(self) -> int:
        return len(self.table_names())

    def __enter__(self) -> "LanceDBConnection":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def close(self) -> None:
        """Stop background refresh and release resources (reference
        close(); the connection is unusable afterwards)."""
        refresher = getattr(self, "_refresher", None)
        if refresher is not None and hasattr(refresher, "stop"):
            refresher.stop()
        self._closed = True

    def is_open(self) -> bool:
        return not getattr(self, "_closed", False)

    def table_exists(self, name: str) -> bool:
        root = self._table_root(name)
        return self._store.exists(f"{root}/{VERSIONS_DIR}")

    def list_tables(self, **kw) -> list[str]:  # reference alias
        return self.table_names(**kw)

    def _table_root(self, name: str) -> str:
        if "/" in name or name.startswith("."):
            raise InvalidInputError(f"invalid table name {name!r}")
        return f"{self._root}/{name}{TABLE_SUFFIX}"

    def table_names(self, page_token: str | None = None, limit: int | None = None) -> list[str]:
        names = []
        for path in self._store.list(self._root):
            base = path.rsplit("/", 1)[-1]
            if base.endswith(TABLE_SUFFIX):
                names.append(base[: -len(TABLE_SUFFIX)])
        names.sort()
        if page_token is not None:
            names = [n for n in names if n > page_token]
        if limit is not None:
            names = names[:limit]
        return names

    def create_table(
        self,
        name: str,
        data: Any = None,
        schema: pa.Schema | None = None,
        mode: str = "create",
        exist_ok: bool = False,
        on_bad_vectors: str = "error",
        embedding_functions: list | None = None,
        **unused,
    ) -> Table:
        """Create a table from data and/or schema (reference
        connection.rs CreateTableBuilder, python db.py create_table)."""
        if mode not in ("create", "overwrite"):
            raise InvalidInputError(f"unknown mode {mode!r}")
        if mode == "create" and exist_ok:
            mode = "exist_ok"

        # pydantic LanceModel schema support; SourceField/VectorField
        # markers on the model become embedding definitions (reference
        # python table.py parse_embedding_functions)
        if schema is not None and not isinstance(schema, pa.Schema):
            if hasattr(schema, "to_arrow_schema"):
                if not embedding_functions and hasattr(schema, "model_fields"):
                    from .pydantic import parse_embedding_functions

                    embedding_functions = parse_embedding_functions(schema) or None
                schema = schema.to_arrow_schema()
            else:
                raise InvalidInputError("schema must be a pyarrow.Schema or LanceModel")

        if data is None and schema is None:
            raise InvalidInputError("either data or schema is required")

        embed_data = None
        if embedding_functions:
            from .embeddings.registry import EmbeddingFunctionRegistry

            registry = EmbeddingFunctionRegistry.get_instance()
            if schema is None:
                schema = to_arrow_table(data).schema
            # add missing vector columns sized by each provider, then
            # route the initial data through Table.add so source text
            # embeds exactly like later appends (reference WithEmbeddings)
            for d in embedding_functions:
                if d.vector_column not in schema.names:
                    from .embeddings.multimodal import MultiVectorEmbeddingFunction

                    fn = registry.get(d.function_name).create(**(d.config or {}))
                    inner = pa.list_(pa.float32(), fn.ndims())
                    col_type = (
                        pa.list_(inner)  # multivector bags (colpali family)
                        if isinstance(fn, MultiVectorEmbeddingFunction)
                        else inner
                    )
                    schema = schema.append(pa.field(d.vector_column, col_type))
            schema = registry.attach_metadata(schema, embedding_functions)
            embed_data, data = data, None

        tbl = to_arrow_table(data, schema=schema) if data is not None else None
        if tbl is not None:
            from .arrow import sanitize_vectors

            tbl = sanitize_vectors(tbl, on_bad_vectors, unused.get("fill_value", 0.0))
        if schema is None:
            schema = tbl.schema
        root = self._table_root(name)
        # blob columns: payloads go out-of-line, schema becomes descriptors
        from .blob import blob_columns, encode_blobs, physical_schema

        if blob_columns(schema):
            if tbl is not None:
                tbl = encode_blobs(self._store, root, tbl, schema)
            schema = physical_schema(schema)
        try:
            ds = Dataset.create(
                self._store,
                root,
                schema,
                data=tbl,
                mode=mode,
            )
        except TableAlreadyExistsError:
            raise TableAlreadyExistsError(name) from None
        table = Table(self, name, ds)
        if embed_data is not None:
            table.add(
                embed_data,
                on_bad_vectors=on_bad_vectors,
                fill_value=unused.get("fill_value", 0.0),
            )
        return table

    def open_table(
        self,
        name: str,
        *,
        version: int | None = None,
        tag: str | None = None,
        branch: str | None = None,
        **unused,
    ) -> Table:
        root = self._table_root(name)
        if not self._store.exists(f"{root}/{VERSIONS_DIR}"):
            raise TableNotFoundError(name)
        ds = Dataset.open(self._store, root, version=version, tag=tag, branch=branch)
        return Table(self, name, ds)

    def drop_table(self, name: str, ignore_missing: bool = False) -> None:
        root = self._table_root(name)
        if not self._store.exists(f"{root}/{VERSIONS_DIR}"):
            if ignore_missing:
                return
            raise TableNotFoundError(name)
        self._store.delete(root)

    def rename_table(self, old: str, new: str) -> None:
        old_root = self._table_root(old)
        new_root = self._table_root(new)
        if not self._store.exists(f"{old_root}/{VERSIONS_DIR}"):
            raise TableNotFoundError(old)
        if self._store.exists(f"{new_root}/{VERSIONS_DIR}"):
            raise TableAlreadyExistsError(new)
        self._store.rename_prefix(old_root, new_root)

    def clone_table(
        self,
        source: str,
        target: str,
        *,
        version: int | None = None,
        tag: str | None = None,
    ) -> Table:
        """Copy a table (optionally at a pinned version/tag) into a new
        table (reference CloneTableBuilder, connection.rs:119-374)."""
        src = self.open_table(source)
        if tag is not None:
            src.checkout(tag)
        elif version is not None:
            src.checkout(version)
        data = src.to_arrow()
        return self.create_table(target, data if data.num_rows else None, schema=src.schema)

    def __getitem__(self, name: str) -> Table:
        return self.open_table(name)

    # ---- jobs (reference connection.rs:526-556 job APIs) ----
    def list_jobs(self, include_finished: bool = True) -> list[dict]:
        return self._jobs.list(include_finished)

    def get_job(self, job_id: str):
        return self._jobs.get(job_id)

    def cancel_job(self, job_id: str) -> bool:
        return self._jobs.cancel(job_id)

    def job(self, job_id: str):
        """Look up a job handle by id (reference Connection job APIs,
        connection.rs:526-556)."""
        return self._jobs.get(job_id)

    def job_history(self) -> list[dict]:
        return self._jobs.history()

    # ---- serialization (reference db.py:795 serialize) -----------------
    def serialize(self) -> str:
        """Serialize this connection for reconstruction in another
        process/worker; pass to ``lancedb_tpu.deserialize_conn``."""
        import json as _json

        return _json.dumps(
            {
                "connection_type": "local",
                "uri": self.uri,
                "storage_options": self.storage_options,
                "read_consistency_interval_seconds": self.read_consistency_interval,
            }
        )

    # ---- namespace catalog ops (reference Connection namespace CRUD,
    # connection.rs:399-649; directory-backed here — a namespace is a
    # subdirectory with a .namespace.json marker, see namespace.py) ------
    @property
    def namespace_client(self):
        from .namespace import LanceNamespaceConnection

        if not hasattr(self, "_ns_client"):
            self._ns_client = LanceNamespaceConnection(self.uri, self.storage_options)
        return self._ns_client

    def create_namespace(self, namespace_path: list[str], mode: str = "create",
                         properties: dict | None = None) -> None:
        return self.namespace_client.create_namespace(
            namespace_path, properties=properties, mode=mode or "create"
        )

    def drop_namespace(self, namespace_path: list[str], **kw) -> None:
        return self.namespace_client.drop_namespace(namespace_path, **kw)

    def list_namespaces(self, namespace_path: list[str] | None = None) -> list[str]:
        return self.namespace_client.list_namespaces(namespace_path)

    def namespace_exists(self, namespace_path: list[str]) -> bool:
        return self.namespace_client.namespace_exists(namespace_path)

    def describe_namespace(self, namespace_path: list[str]) -> dict:
        return self.namespace_client.describe_namespace(namespace_path)


def deserialize_conn(serialized: str) -> "LanceDBConnection":
    """Recreate a connection from ``LanceDBConnection.serialize()``
    (reference lancedb.deserialize_conn)."""
    import json as _json

    doc = _json.loads(serialized)
    if doc.get("connection_type") != "local":
        raise InvalidInputError(f"unknown connection_type {doc.get('connection_type')!r}")
    return LanceDBConnection(
        doc["uri"],
        storage_options=doc.get("storage_options") or None,
        read_consistency_interval=doc.get("read_consistency_interval_seconds"),
    )


class AsyncConnection:
    """Async facade (reference AsyncConnection). Blocking work runs on
    the shared bounded lancedb-aio executor (aio.py)."""

    def __init__(self, inner: LanceDBConnection):
        self._c = inner

    @property
    def uri(self) -> str:
        return self._c.uri

    @property
    def session(self):
        return getattr(self._c, "session", None)

    async def get_read_consistency_interval(self) -> float | None:
        """Read-consistency interval in seconds, or None for strong
        consistency at open (reference db.py:1358)."""
        return getattr(self._c, "read_consistency_interval", None)

    async def _run(self, fn, *args, **kw):
        from .aio import _run

        return await _run(fn, *args, **kw)

    async def table_names(self, **kw) -> list[str]:
        return await self._run(self._c.table_names, **kw)

    async def create_table(self, name: str, data=None, schema=None, **kw) -> AsyncTable:
        t = await self._run(lambda: self._c.create_table(name, data, schema, **kw))
        return AsyncTable(t)

    async def open_table(self, name: str, **kw) -> AsyncTable:
        t = await self._run(lambda: self._c.open_table(name, **kw))
        return AsyncTable(t)

    async def drop_table(self, name: str, ignore_missing: bool = False) -> None:
        await self._run(self._c.drop_table, name, ignore_missing)

    async def rename_table(self, old: str, new: str) -> None:
        await self._run(self._c.rename_table, old, new)

    async def drop_all_tables(self) -> None:
        await self._run(self._c.drop_all_tables)


def connect(
    uri: str,
    *,
    api_key: str | None = None,
    host_override: str | None = None,
    read_consistency_interval: float | None = None,
    storage_options: dict | None = None,
    client_config=None,
    session=None,
    **unused,
):
    """Connect to a database (reference __init__.py:69 connect).

    URI routing mirrors reference connection.rs:1040-1063:
      * ``db://name``  → remote client (requires host_override in this
        build; api_key from the LANCEDB_API_KEY env var if unset)
      * anything else  → local/memory listing database
    """
    if uri.startswith("s3://"):
        # S3 buckets with dots break virtual-hosted-style region
        # detection (reference __init__.py:36-66, lancedb issue #1898)
        from urllib.parse import urlparse

        bucket = urlparse(uri).netloc
        if "." in bucket and not (
            storage_options and ({"region", "aws_region"} & set(storage_options))
        ):
            raise InvalidInputError(
                f"S3 bucket name {bucket!r} contains dots, which prevents "
                "automatic region detection; pass storage_options="
                "{'region': '<your-region>'}"
            )
    if uri.startswith("db://"):
        import os

        from .remote import connect_remote

        if host_override is None:
            raise InvalidInputError(
                "db:// URIs need host_override=<server url> in this build"
            )
        api_key = api_key or os.environ.get("LANCEDB_API_KEY")
        return connect_remote(host_override, api_key=api_key, config=client_config)
    return LanceDBConnection(
        uri,
        read_consistency_interval=read_consistency_interval,
        storage_options=storage_options,
        session=session,
        storage_options_provider=unused.pop("storage_options_provider", None),
    )


async def connect_async(
    uri: str,
    *,
    read_consistency_interval: float | None = None,
    storage_options: dict | None = None,
    **unused,
) -> AsyncConnection:
    return AsyncConnection(
        connect(
            uri,
            read_consistency_interval=read_consistency_interval,
            storage_options=storage_options,
        )
    )
