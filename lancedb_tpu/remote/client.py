"""Remote database client: REST + Arrow IPC with retries.

Reference: remote/client.rs (ClientConfig `:66-285`, retry w/ backoff +
jitter on 409/429/5xx `:753` + retry.rs, request-id header `:16`),
remote/db.rs `RemoteDatabase`, remote/table.rs `RemoteTable` (full
BaseTable over POST /v1/table/{id}/...). Stdlib urllib — no external
HTTP dependency.
"""

from __future__ import annotations

import random
import time
import urllib.error
import urllib.parse
import urllib.request
import uuid as _uuid
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa

from ..errors import HttpError, InvalidInputError, RetryError
from .protocol import (
    CONTENT_ARROW,
    CONTENT_JSON,
    REQUEST_ID_HEADER,
    dumps,
    ipc_to_table,
    loads,
    table_to_ipc,
)


@dataclass
class TimeoutConfig:
    """Reference remote/client.rs:186 TimeoutConfig."""

    connect_timeout: float = 120.0
    read_timeout: float = 300.0


@dataclass
class RetryConfig:
    """Reference remote/client.rs:222-284 RetryConfig."""

    retries: int = 3
    connect_retries: int = 3
    read_retries: int = 3
    backoff_factor: float = 0.25
    backoff_jitter: float = 0.25
    statuses: tuple[int, ...] = (409, 429, 500, 502, 503)


@dataclass
class ClientConfig:
    """Reference remote/client.rs:66 ClientConfig."""

    user_agent: str = "lancedb-tpu-python/0.1.0"
    retry_config: RetryConfig = field(default_factory=RetryConfig)
    timeout_config: TimeoutConfig = field(default_factory=TimeoutConfig)
    extra_headers: dict[str, str] = field(default_factory=dict)


class RestClient:
    def __init__(self, base_url: str, api_key: str | None = None, config: ClientConfig | None = None):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.config = config or ClientConfig()

    def request(
        self,
        method: str,
        path: str,
        *,
        json_body: Any | None = None,
        raw_body: bytes | None = None,
        params: dict | None = None,
        content_type: str = CONTENT_JSON,
    ) -> tuple[int, bytes, dict]:
        url = self.base_url + path
        if params:
            url += "?" + urllib.parse.urlencode(params)
        body = raw_body if raw_body is not None else (dumps(json_body) if json_body is not None else None)
        rc = self.config.retry_config
        request_id = _uuid.uuid4().hex
        last_err: Exception | None = None
        for attempt in range(rc.retries + 1):
            req = urllib.request.Request(url, data=body, method=method)
            req.add_header("user-agent", self.config.user_agent)
            req.add_header(REQUEST_ID_HEADER, request_id)
            req.add_header("content-type", content_type)
            if self.api_key:
                req.add_header("x-api-key", self.api_key)
            for k, v in self.config.extra_headers.items():
                req.add_header(k, v)
            try:
                with urllib.request.urlopen(req, timeout=self.config.timeout_config.read_timeout) as resp:
                    return resp.status, resp.read(), dict(resp.headers)
            except urllib.error.HTTPError as e:
                payload = e.read()
                if e.code in rc.statuses and attempt < rc.retries:
                    delay = rc.backoff_factor * (2**attempt)
                    delay += random.uniform(0, rc.backoff_jitter)
                    time.sleep(delay)
                    last_err = e
                    continue
                message = payload.decode(errors="replace")
                try:
                    message = loads(payload).get("error", message)
                except Exception:
                    pass
                raise HttpError(message, status_code=e.code, request_id=request_id) from None
            except urllib.error.URLError as e:
                if attempt < rc.connect_retries:
                    time.sleep(rc.backoff_factor * (2**attempt))
                    last_err = e
                    continue
                raise HttpError(f"connection failed: {e.reason}", request_id=request_id) from None
        raise RetryError(
            f"retries exhausted after {rc.retries + 1} attempts: {last_err}",
            request_id=request_id,
        )

    def post_json(self, path: str, body: Any | None = None, params: dict | None = None) -> dict:
        _, data, _ = self.request("POST", path, json_body=body or {}, params=params)
        return loads(data)

    def post_arrow_in(self, path: str, tbl: pa.Table, params: dict | None = None) -> dict:
        _, data, _ = self.request(
            "POST", path, raw_body=table_to_ipc(tbl), params=params, content_type=CONTENT_ARROW
        )
        return loads(data)

    def post_arrow_out(self, path: str, body: Any) -> pa.Table:
        _, data, _ = self.request("POST", path, json_body=body)
        return ipc_to_table(data)

    def get_json(self, path: str, params: dict | None = None) -> dict:
        _, data, _ = self.request("GET", path, params=params)
        return loads(data)


class RemoteTable:
    """Client-side table handle (reference remote/table.rs:270)."""

    def __init__(self, client: RestClient, name: str):
        self._c = client
        self.name = name

    def _p(self, op: str) -> str:
        return f"/v1/table/{urllib.parse.quote(self.name)}/{op}/"

    # ---- reads ----
    @property
    def schema(self) -> pa.Schema:
        desc = self.describe()
        fields = [
            pa.field(f["name"], _parse_type(f["type"]), nullable=f["nullable"])
            for f in desc["schema"]["fields"]
        ]
        return pa.schema(fields)

    def describe(self) -> dict:
        return self._c.post_json(self._p("describe"))

    @property
    def version(self) -> int:
        return self.describe()["version"]

    def count_rows(self, filter: str | None = None) -> int:
        return self._c.post_json(self._p("count_rows"), {"predicate": filter})

    def stats(self) -> dict:
        return self.describe()["stats"]

    # ---- search ----
    def search(self, query=None, vector_column_name=None, query_type="auto", fts_columns=None):
        from .query import RemoteQueryBuilder

        return RemoteQueryBuilder(self, query, vector_column_name, query_type, fts_columns)

    def _query(self, body: dict) -> pa.Table:
        return self._c.post_arrow_out(self._p("query"), body)

    def explain_plan(self, vector, k: int = 10) -> str:
        return self._c.post_json(
            self._p("explain_plan"), {"vector": list(map(float, vector)), "k": k}
        )["plan"]

    def analyze_plan(self, vector, k: int = 10) -> str:
        return self._c.post_json(
            self._p("analyze_plan"), {"vector": list(map(float, vector)), "k": k}
        )["plan"]

    # ---- writes ----
    def add(self, data, mode: str = "append") -> None:
        from ..arrow import to_arrow_table

        self._c.post_arrow_in(self._p("insert"), to_arrow_table(data), params={"mode": mode})

    def update(self, where: str | None = None, values: dict | None = None, *, values_sql: dict | None = None) -> dict:
        updates = []
        for col, val in (values or {}).items():
            if isinstance(val, str):
                updates.append([col, "'" + val.replace("'", "''") + "'"])
            else:
                updates.append([col, repr(val)])
        for col, expr in (values_sql or {}).items():
            updates.append([col, expr])
        return self._c.post_json(self._p("update"), {"predicate": where, "updates": updates})

    def delete(self, predicate: str) -> int:
        return self._c.post_json(self._p("delete"), {"predicate": predicate})["deleted_rows"]

    def merge_insert(self, on: str | list[str]):
        from ..table import MergeInsertBuilder

        on = [on] if isinstance(on, str) else list(on)
        outer = self

        class _RemoteMergeBuilder(MergeInsertBuilder):
            def __init__(self):
                self._on = on
                self._update_all = False
                self._update_condition = None
                self._insert_all = False
                self._delete_missing = False
                self._delete_condition = None

            def execute(self, new_data, timeout=None) -> dict:
                from ..arrow import to_arrow_table

                params = {
                    "on": ",".join(self._on),
                    "when_matched_update_all": str(self._update_all).lower(),
                    "when_not_matched_insert_all": str(self._insert_all).lower(),
                    "when_not_matched_by_source_delete": str(self._delete_missing).lower(),
                }
                if self._update_condition:
                    params["when_matched_update_all_filt"] = self._update_condition
                if self._delete_condition:
                    params["when_not_matched_by_source_delete_filt"] = self._delete_condition
                return outer._c.post_arrow_in(
                    outer._p("merge_insert"), to_arrow_table(new_data), params=params
                )

        return _RemoteMergeBuilder()

    # ---- indexes ----
    def create_index(
        self,
        metric: str = "l2",
        num_partitions: int | None = None,
        num_sub_vectors: int | None = None,
        vector_column_name: str | None = None,
        index_type: str = "IVF_PQ",
        **kw,
    ) -> None:
        self._c.post_json(
            self._p("create_index"),
            {
                "column": vector_column_name,
                "index_type": index_type,
                "metric_type": metric,
                "num_partitions": num_partitions,
                "num_sub_vectors": num_sub_vectors,
            },
        )

    def create_scalar_index(self, column: str, index_type: str = "BTREE", **kw) -> None:
        self._c.post_json(self._p("create_index"), {"column": column, "index_type": index_type})

    def create_fts_index(self, field_names, **kw) -> None:
        self._c.post_json(
            self._p("create_index"),
            {"column": field_names, "index_type": "FTS", **{k: v for k, v in kw.items() if isinstance(v, (str, int, bool))}},
        )

    def list_indices(self) -> list[dict]:
        return self._c.post_json(self._p("index/list"))["indexes"]

    def index_stats(self, index_name: str) -> dict:
        return self._c.post_json(self._p("index/stats"), {"index_name": index_name})

    def drop_index(self, name: str) -> None:
        self._c.post_json(self._p("index/drop"), {"index_name": name})

    # ---- versions / tags ----
    def list_versions(self) -> list[dict]:
        return self._c.post_json(self._p("version/list"))["versions"]

    def checkout(self, version: int) -> None:
        self._c.post_json(self._p("checkout"), {"version": version})

    def restore(self, version: int | None = None) -> None:
        self._c.post_json(self._p("restore"), {"version": version})

    def optimize(self) -> dict:
        return self._c.post_json(self._p("optimize"))

    @property
    def tags(self):
        outer = self

        class _Tags:
            def list(self):
                return outer._c.post_json(outer._p("tags/list"))

            def create(self, name, version=None):
                outer._c.post_json(outer._p("tags/create"), {"tag": name, "version": version})

            def delete(self, name):
                outer._c.post_json(outer._p("tags/delete"), {"tag": name})

            def update(self, name, version):
                outer._c.post_json(outer._p("tags/update"), {"tag": name, "version": version})

        return _Tags()


class RemoteDBConnection:
    """Reference remote/db.rs `RemoteDatabase` equivalent."""

    def __init__(self, url: str, api_key: str | None = None, config: ClientConfig | None = None):
        self._client = RestClient(url, api_key, config)
        self.uri = url

    def table_names(self, page_token: str | None = None, limit: int | None = None) -> list[str]:
        params = {}
        if page_token:
            params["page_token"] = page_token
        if limit:
            params["limit"] = str(limit)
        return self._client.get_json("/v1/table", params or None)["tables"]

    def create_table(self, name: str, data=None, schema=None, mode: str = "create", **kw) -> RemoteTable:
        from ..arrow import to_arrow_table

        tbl = to_arrow_table(data, schema=schema)
        self._client.post_arrow_in(f"/v1/table/{urllib.parse.quote(name)}/create/", tbl)
        return RemoteTable(self._client, name)

    def open_table(self, name: str, **kw) -> RemoteTable:
        t = RemoteTable(self._client, name)
        t.describe()  # 404s if missing
        return t

    def drop_table(self, name: str) -> None:
        self._client.post_json(f"/v1/table/{urllib.parse.quote(name)}/drop/")

    def rename_table(self, old: str, new: str) -> None:
        self._client.post_json(
            f"/v1/table/{urllib.parse.quote(old)}/rename/", {"new_name": new}
        )

    def drop_all_tables(self) -> None:
        for n in self.table_names():
            self.drop_table(n)


def _parse_type(type_str: str) -> pa.DataType:
    """Parse the subset of Arrow type strings the server emits."""
    s = type_str.strip()
    simple = {
        "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(), "int64": pa.int64(),
        "uint8": pa.uint8(), "uint16": pa.uint16(), "uint32": pa.uint32(), "uint64": pa.uint64(),
        "float": pa.float32(), "double": pa.float64(), "halffloat": pa.float16(),
        "string": pa.string(), "large_string": pa.large_string(), "bool": pa.bool_(),
        "binary": pa.binary(), "large_binary": pa.large_binary(),
        "date32[day]": pa.date32(), "timestamp[us]": pa.timestamp("us"),
    }
    if s in simple:
        return simple[s]
    import re as _re

    m = _re.match(r"^fixed_size_list<item: (\w+)>\[(\d+)\]$", s)
    if m:
        return pa.list_(simple.get(m.group(1), pa.float32()), int(m.group(2)))
    m = _re.match(r"^list<item: (\w+)>$", s)
    if m:
        return pa.list_(simple.get(m.group(1), pa.float32()))
    raise InvalidInputError(f"cannot parse remote type {type_str!r}")


def connect_remote(url: str, api_key: str | None = None, config: ClientConfig | None = None) -> RemoteDBConnection:
    return RemoteDBConnection(url, api_key, config)
