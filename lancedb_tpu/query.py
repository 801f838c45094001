"""Query builders + execution: the hot path of the framework.

Mirrors the reference query surface (rust query.rs QueryBase/
VectorQuery/ExecutableQuery; python query.py LanceQueryBuilder family)
— fluent builders that accumulate a request and execute against the
table's dataset + indexes.

Execution pipeline (reference create_plan, table/query.rs:131-331,
re-architected for TPU):

  1. resolve vector column + index; compute the prefilter row-id set
     from the SQL predicate (host, Arrow compute)
  2. device search: index searcher (IVF/PQ/SQ/FLAT kernels) over
     indexed fragments + brute-force over unindexed "delta" fragments,
     merged — delta-index semantics without rebuilds
  3. optional exact refine rerank (late materialization)
  4. distance_range / postfilter / offset+limit on the host
  5. hydrate selected columns via take_rows, append _distance
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Iterable

import numpy as np
import pyarrow as pa

from .arrow import fsl_to_numpy, vector_column_name
from .errors import InvalidInputError
from .filters.eval import evaluate_expression, evaluate_predicate_mask
from .filters.sql import parse_sql_expr
from .index.vector import SearchParams, brute_force_search
from .ops.distance import normalize_metric
from .storage.dataset import ROW_ID_COL

DEFAULT_TOP_K = 10  # reference query.rs:36
DEFAULT_NPROBES = 20  # reference query.rs:1103-1105

DIST_COL = "_distance"
SCORE_COL = "_score"
RELEVANCE_COL = "_relevance_score"
QUERY_INDEX_COL = "query_index"

_INVALID_ROWID = np.uint64(np.iinfo(np.uint64).max)


@dataclass
class ColumnOrdering:
    """One ORDER BY key for query results (reference query.py:361
    ColumnOrdering pydantic model)."""

    column_name: str
    ascending: bool = True
    nulls_first: bool = False


@dataclass
class VectorQueryRequest:
    """Accumulated query state (reference VectorQueryRequest, query.rs:1067-1114)."""

    column: str | None = None
    query_vectors: list[np.ndarray] = field(default_factory=list)
    k: int = DEFAULT_TOP_K
    offset: int = 0
    filter: str | None = None
    prefilter: bool = True
    minimum_nprobes: int = DEFAULT_NPROBES
    maximum_nprobes: int | None = DEFAULT_NPROBES
    refine_factor: int | None = None
    distance_type: str | None = None
    lower_bound: float | None = None
    upper_bound: float | None = None
    ef: int | None = None
    use_index: bool = True
    fast_search: bool = False
    with_row_id: bool = False
    select: list[str] | dict[str, str] | None = None
    precision: str = "default"


def _result_sort(tbl: pa.Table, col: str, ascending: bool = True) -> pa.Table:
    order = "ascending" if ascending else "descending"
    return tbl.sort_by([(col, order)])


def execute_vector_query(table, req: VectorQueryRequest) -> pa.Table:
    """Run one (or a batch of) vector queries → Arrow result table."""
    ds = table._dataset
    column = req.column or vector_column_name(ds.schema)
    if not req.query_vectors:
        raise InvalidInputError("no query vector provided")
    # multivector column → late-interaction path (reference
    # table/query.rs:168-218 multivector handling)
    from .index.multivector import is_multivector_type

    if column in ds.schema.names and is_multivector_type(ds.schema.field(column).type):
        return _execute_multivector_query(table, req, column)
    # nprobes validation (reference query.rs minimum/maximum_nprobes;
    # maximum_nprobes=0 means "no limit")
    if req.minimum_nprobes <= 0:
        raise InvalidInputError("minimum_nprobes must be greater than 0")
    if req.maximum_nprobes == 0:
        req.maximum_nprobes = None
    if req.maximum_nprobes is not None and req.maximum_nprobes < req.minimum_nprobes:
        raise InvalidInputError(
            "maximum_nprobes must be greater than or equal to minimum_nprobes"
        )
    queries = np.stack([np.asarray(v, dtype=np.float32).reshape(-1) for v in req.query_vectors])
    multi = len(req.query_vectors) > 1

    # ---- index resolution ------------------------------------------------
    index_meta = None
    if req.use_index:
        for ix in ds.manifest.indices:
            if ix.columns == [column] and ix.index_type.startswith(("IVF", "FLAT")):
                index_meta = ix
                break
    searcher = table._get_searcher(index_meta) if index_meta is not None else None
    metric = normalize_metric(
        req.distance_type or (searcher.metric if searcher else "l2")
    )
    if searcher is not None and req.distance_type is not None and metric != searcher.metric:
        # metric override that disagrees with the index → brute force
        searcher = None
        index_meta = None

    # ---- prefilter -------------------------------------------------------
    allowed: np.ndarray | None = None
    if req.filter is not None and req.prefilter:
        with _op_timer("PrefilterExec") as t:
            allowed = compute_allowed_rowids(table, req.filter)
            t.set_rows(len(allowed))
        if len(allowed) == 0:
            return _empty_result(table, req, multi)

    # deleted rows that an already-built index may still contain
    deleted, vanished = (
        _deleted_rowids(ds, index_meta) if index_meta is not None else (None, None)
    )

    k_search = req.k + req.offset

    # ---- search ----------------------------------------------------------
    if searcher is not None:
        pen = searcher.slot_penalty(allowed, deleted, vanished_fragments=vanished)
        if req.refine_factor is not None and hasattr(searcher, "prepare_device_refine"):
            # fused on-device refine when a resident copy of the column
            # fits HBM — search() then returns already-refined results
            # in one dispatch chain instead of a host gather per batch.
            # float32-precision requests upload an exact f32 table.
            searcher.prepare_device_refine(
                ds, column,
                precision="float32" if req.precision == "float32" else None,
            )

        def run(nprobes: int):
            params = SearchParams(
                k=k_search,
                nprobes=nprobes,
                refine_factor=req.refine_factor,
                ef=req.ef,
                precision=req.precision,
            )
            fused = hasattr(searcher, "will_fuse_refine") and searcher.will_fuse_refine(
                params
            )
            d, r = searcher.search(queries, params, slot_penalty=pen)
            if req.refine_factor is not None and not fused:
                d, r = searcher.refine(ds, column, queries, d, r, k_search)
            return d, r

        with _op_timer("ANNSubIndexExec") as t:
            dists, rowids = run(req.minimum_nprobes)
            # adaptive expansion (reference minimum/maximum_nprobes,
            # query.rs:1215-1283): when filters starve the probed partitions,
            # retry once at maximum_nprobes before falling back
            # None = no limit (maximum_nprobes=0): expand to every
            # partition; the searcher clamps to its block count
            max_np = (req.maximum_nprobes if req.maximum_nprobes is not None
                      else max(req.minimum_nprobes, 1 << 20))
            if max_np > req.minimum_nprobes:
                underfull = (rowids == _INVALID_ROWID).sum(axis=1) > 0
                if underfull.any():
                    dists, rowids = run(max_np)
            t.set_rows(int((rowids != _INVALID_ROWID).sum()))
        # delta fragments not covered by the index → brute force + merge
        if not req.fast_search:
            covered = set(index_meta.fragment_ids)
            delta = [f for f in ds.manifest.fragments if f.id not in covered]
            if delta:
                with _op_timer("KnnFlatExec") as t:
                    d2, r2 = _brute_force_fragments(
                        ds, column, queries, k_search, metric, req, allowed, frags=delta
                    )
                    t.set_rows(int((r2 != _INVALID_ROWID).sum()))
                dists, rowids = _merge_host(dists, rowids, d2, r2, k_search)
    else:
        with _op_timer("KnnFlatExec") as t:
            dists, rowids = _brute_force_fragments(
                ds, column, queries, k_search, metric, req, allowed, frags=ds.manifest.fragments
            )
            t.set_rows(int((rowids != _INVALID_ROWID).sum()))

    # ---- distance range / postfilter ------------------------------------
    if req.lower_bound is not None:
        dists = np.where(dists >= req.lower_bound, dists, np.inf)
    if req.upper_bound is not None:
        dists = np.where(dists < req.upper_bound, dists, np.inf)
    rowids = np.where(np.isfinite(dists), rowids, _INVALID_ROWID)

    # ---- hydrate ---------------------------------------------------------
    from .metrics import recorder

    recorder().increment_counter(
        "lancedb.queries", labels={"table": table.name, "kind": "vector"}
    )
    with _op_timer("TakeExec") as t:
        out = _hydrate_results(table, req, queries, dists, rowids, multi)
        t.set_rows(out.num_rows)
    if req.filter is not None and not req.prefilter and out.num_rows:
        with _op_timer("FilterExec") as t:
            mask = evaluate_predicate_mask(out, req.filter)
            out = out.filter(pa.array(mask))
            t.set_rows(out.num_rows)
    if req.offset:
        per_query_offset = req.offset
        if multi:
            parts = []
            for qi in range(len(req.query_vectors)):
                sub = out.filter(pa.compute.equal(out.column(QUERY_INDEX_COL), qi))
                parts.append(sub.slice(per_query_offset, req.k))
            out = pa.concat_tables(parts) if parts else out
        else:
            out = out.slice(per_query_offset, req.k)
    return out


def _execute_multivector_query(table, req: VectorQueryRequest, column: str) -> pa.Table:
    """ColBERT-style maxsim retrieval over a multivector column."""
    from .index.multivector import multivector_search

    ds = table._dataset
    tokens = np.stack([np.asarray(v, dtype=np.float32).reshape(-1) for v in req.query_vectors])
    allowed = None
    if req.filter is not None and req.prefilter:
        t = ds.to_table(columns=[], predicate=req.filter, with_row_id=True)
        allowed = np.sort(t.column(ROW_ID_COL).to_numpy().astype(np.uint64))
        if len(allowed) == 0:
            return _empty_result(table, req, multi=False)
    searcher = None
    if req.use_index:
        for ix in ds.manifest.indices:
            if ix.columns == [column] and ix.params.get("multivector"):
                covered = {f.id for f in ds.manifest.fragments} == set(ix.fragment_ids)
                if covered:
                    searcher = table._get_searcher(ix)
                break
    scores, rowids = multivector_search(
        table, column, tokens, req.k + req.offset,
        searcher=searcher, nprobes=req.minimum_nprobes, allowed=allowed,
    )
    # similarity → distance convention: higher maxsim = closer
    dists = -scores
    out = _hydrate_results(
        table, req, tokens, dists[None, :], rowids[None, :], multi=False
    )
    if req.filter is not None and not req.prefilter and out.num_rows:
        mask = evaluate_predicate_mask(out, req.filter)
        out = out.filter(pa.array(mask))
    if req.offset:
        out = out.slice(req.offset, req.k)
    return out


def compute_allowed_rowids(table, predicate: str) -> np.ndarray:
    """Predicate → sorted allowed row addresses: scalar-index fast path
    (BTree/Bitmap lookups, reference scalar-index prefilter pushdown)
    with a full Arrow-compute scan as fallback."""
    from .index.scalar import try_scalar_prefilter

    ds = table._dataset
    ast = parse_sql_expr(predicate)
    fast = try_scalar_prefilter(table, ast)
    if fast is not None:
        return np.sort(np.asarray(fast, dtype=np.uint64))
    t = ds.to_table(columns=[], predicate=predicate, with_row_id=True)
    return np.sort(t.column(ROW_ID_COL).to_numpy().astype(np.uint64))


def _deleted_rowids(ds, index_meta) -> tuple[np.ndarray | None, set[int] | None]:
    """(deleted row addresses, vanished fragment ids) the index may still
    contain: rows deleted after the build, and fragments dropped entirely
    (fully-deleted or compacted away)."""
    out = []
    covered = set(index_meta.fragment_ids)
    present = set()
    for meta in ds.manifest.fragments:
        present.add(meta.id)
        if meta.id not in covered:
            continue
        keep = ds._keep_mask(meta)
        if keep is not None:
            gone = np.nonzero(~keep)[0].astype(np.uint64)
            out.append((np.uint64(meta.id) << np.uint64(32)) | gone)
    vanished = covered - present
    deleted = np.concatenate(out) if out else None
    return deleted, (vanished or None)


def _brute_force_fragments(ds, column, queries, k, metric, req, allowed, frags):
    """Exact scan over a set of fragments (predicate applied during scan)."""
    wanted = {f.id for f in frags}
    dtype = np.uint8 if metric == "hamming" else np.float32
    mats, rids = [], []
    for m, tbl in ds.scan_fragments(
        columns=[column],
        predicate=req.filter if req.prefilter else None,
        with_row_id=True,
    ):
        if m.id not in wanted:
            continue
        mats.append(fsl_to_numpy(tbl.column(column), dtype=dtype))
        rids.append(tbl.column(ROW_ID_COL).to_numpy().astype(np.uint64))
    if not mats:
        nq = queries.shape[0]
        return (
            np.full((nq, k), np.inf, np.float32),
            np.full((nq, k), _INVALID_ROWID, np.uint64),
        )
    vecs = np.concatenate(mats)
    all_rids = np.concatenate(rids)
    precision = "bfloat16" if req.precision == "bfloat16" else "float32"
    q_cast = queries.astype(dtype) if metric == "hamming" else queries
    d, r = brute_force_search(vecs, all_rids, q_cast, min(k, len(vecs)), metric, precision)
    if d.shape[1] < k:
        pad = k - d.shape[1]
        d = np.pad(d, ((0, 0), (0, pad)), constant_values=np.inf)
        r = np.pad(r, ((0, 0), (0, pad)), constant_values=_INVALID_ROWID)
    return d, r


def _merge_host(d1, r1, d2, r2, k):
    d = np.concatenate([d1, d2], axis=1)
    r = np.concatenate([r1, r2], axis=1)
    order = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, order, axis=1), np.take_along_axis(r, order, axis=1)


def _selected_columns(table, req) -> list[str] | None:
    if req.select is None:
        return None
    if isinstance(req.select, dict):
        return None  # dynamic projection handled in _hydrate_results
    return list(req.select)


def _hydrate_results(table, req, queries, dists, rowids, multi) -> pa.Table:
    ds = table._dataset
    parts = []
    for qi in range(dists.shape[0]):
        valid = rowids[qi] != _INVALID_ROWID
        rid = rowids[qi][valid]
        dst = dists[qi][valid]
        cols = _selected_columns(table, req)
        data = ds.take_rows(rid, columns=cols)
        if isinstance(req.select, dict):
            arrays, names = [], []
            base = ds.take_rows(rid, columns=None)
            for alias, expr in req.select.items():
                arrays.append(evaluate_expression(base, expr))
                names.append(alias)
            data = pa.table(dict(zip(names, arrays)))
        data = data.append_column(DIST_COL, pa.array(dst.astype(np.float32)))
        if req.with_row_id:
            data = data.append_column(ROW_ID_COL, pa.array(rid, type=pa.uint64()))
        if multi:
            data = data.append_column(
                QUERY_INDEX_COL, pa.array(np.full(len(rid), qi, dtype=np.int32))
            )
        parts.append(data)
    if not parts:
        return _empty_result(table, req, multi)
    return pa.concat_tables(parts)


def _empty_result(table, req, multi) -> pa.Table:
    ds = table._dataset
    cols = _selected_columns(table, req)
    fields = [f for f in ds.schema if cols is None or f.name in cols]
    if isinstance(req.select, dict):
        fields = [pa.field(a, pa.float64()) for a in req.select]
    fields.append(pa.field(DIST_COL, pa.float32()))
    if req.with_row_id:
        fields.append(pa.field(ROW_ID_COL, pa.uint64()))
    if multi:
        fields.append(pa.field(QUERY_INDEX_COL, pa.int32()))
    return pa.schema(fields).empty_table()


# ===================================================================== plans


# ---- per-operator plan metrics (reference analyze_plan renders
# DataFusion operator metrics — query.rs:756; ours collects the same
# shape from the execution stages via a contextvar so plain queries pay
# nothing) -----------------------------------------------------------------
import contextvars

_PLAN_METRICS: contextvars.ContextVar[dict | None] = contextvars.ContextVar(
    "plan_metrics", default=None
)


class _op_timer:
    """Times one operator when an analyze run is active; no-op otherwise."""

    def __init__(self, op: str):
        self.op = op
        self._sink = _PLAN_METRICS.get()
        self.rows = None

    def __enter__(self):
        if self._sink is not None:
            self._t0 = time.perf_counter()
        return self

    def set_rows(self, n: int) -> None:
        self.rows = int(n)

    def __exit__(self, *exc):
        if self._sink is not None:
            rec = self._sink.setdefault(self.op, {"elapsed_s": 0.0, "invocations": 0})
            rec["elapsed_s"] += time.perf_counter() - self._t0
            rec["invocations"] += 1
            if self.rows is not None:
                rec["output_rows"] = rec.get("output_rows", 0) + self.rows


def explain_vector_plan(table, req: VectorQueryRequest) -> str:
    """Textual physical plan (reference explain_plan, query.rs:741)."""
    ds = table._dataset
    column = req.column or vector_column_name(ds.schema)
    index_meta = None
    if req.use_index:
        for ix in ds.manifest.indices:
            if ix.columns == [column]:
                index_meta = ix
                break
    lines = []
    lines.append(f"ProjectionExec: columns={req.select or 'all'} +[_distance]")
    if req.filter and not req.prefilter:
        lines.append(f"  FilterExec: postfilter [{req.filter}]")
    lines.append(f"  SortExec: _distance ASC, limit={req.k} offset={req.offset}")
    lines.append("    TakeExec: late materialization via row addresses")
    if index_meta is not None:
        ix = index_meta
        nprobes = (
            f"{req.minimum_nprobes}..{req.maximum_nprobes}"
            if req.maximum_nprobes not in (None, req.minimum_nprobes)
            else f"{req.minimum_nprobes}"
        )
        ef = f" ef={req.ef}" if req.ef is not None else ""
        lines.append(
            f"      ANNSubIndexExec: {ix.index_type} column={column} "
            f"nprobes={nprobes} refine={req.refine_factor or 0}{ef} "
            f"metric={ix.params.get('metric')} partitions={ix.params.get('num_partitions')}"
        )
        covered = set(ix.fragment_ids)
        delta = [f.id for f in ds.manifest.fragments if f.id not in covered]
        if delta and not req.fast_search:
            lines.append(f"      KnnFlatExec: delta fragments {delta} (MXU matmul scan)")
    else:
        lines.append(f"      KnnFlatExec: brute-force column={column} (MXU matmul scan)")
    if req.filter and req.prefilter:
        lines.append(f"        PrefilterExec: [{req.filter}] → slot penalty mask")
    return "\n".join(lines)


def analyze_vector_plan(table, req: VectorQueryRequest) -> str:
    """Execute + report per-operator metrics (reference analyze_plan,
    query.rs:756 — DataFusion-style `metrics=[...]` per plan line)."""
    from .io.object_store import IoStats, IoTrackingStore

    ds = table._dataset
    stats = IoStats()
    orig_store = ds.store
    ds.store = IoTrackingStore(orig_store, stats)
    op_metrics: dict = {}
    token = _PLAN_METRICS.set(op_metrics)
    try:
        t0 = time.perf_counter()
        out = execute_vector_query(table, req)
        elapsed = time.perf_counter() - t0
    finally:
        _PLAN_METRICS.reset(token)
        ds.store = orig_store
    snap = stats.snapshot()
    plan_lines = []
    for line in explain_vector_plan(table, req).splitlines():
        op = line.strip().split(":", 1)[0]
        rec = op_metrics.get(op)
        if rec is not None:
            parts = [f"output_rows={rec.get('output_rows', 0)}",
                     f"elapsed_compute={rec['elapsed_s'] * 1e3:.3f}ms"]
            if rec["invocations"] > 1:
                parts.append(f"invocations={rec['invocations']}")
            line = f"{line}, metrics=[{', '.join(parts)}]"
        plan_lines.append(line)
    return (
        "\n".join(plan_lines) + "\n"
        f"-- metrics --\n"
        f"elapsed_ms={elapsed * 1e3:.3f} output_rows={out.num_rows} "
        f"iops={snap['read_iops']} bytes_read={snap['read_bytes']}"
    )


# ================================================================= builders


class LanceQueryBuilder:
    """Base fluent builder (reference python query.py LanceQueryBuilder)."""

    def __init__(self, table):
        self._table = table
        self._req = VectorQueryRequest()

    # -- shared fluent setters --
    def where(self, predicate, prefilter: bool = True) -> "LanceQueryBuilder":
        """SQL string, expr-DSL node, or a substrait ExtendedExpression
        blob (reference QueryFilter: Sql | Substrait | Datafusion,
        query.rs:792-812). Multiple calls AND-compose."""
        from .filters.substrait import is_substrait_filter, substrait_to_sql

        if is_substrait_filter(predicate):
            predicate = substrait_to_sql(predicate)
        parse_sql_expr(predicate)  # validate eagerly
        if self._req.filter is not None:
            self._req.filter = f"({self._req.filter}) AND ({predicate})"
        else:
            self._req.filter = predicate
        self._req.prefilter = prefilter
        return self

    filter = where

    def select(self, columns: list[str] | dict[str, str]) -> "LanceQueryBuilder":
        self._req.select = columns
        return self

    def limit(self, k: int) -> "LanceQueryBuilder":
        self._limit_set = True
        if k is None or k <= 0:
            # reference query.py:1183-1187: ANN/KNN queries require a
            # limit; plain scans treat None/0 as "all rows"
            if isinstance(self, LanceVectorQueryBuilder):
                raise ValueError("Limit is required for ANN/KNN queries")
            self._req.k = max(self._table.count_rows(), 1)
        else:
            self._req.k = int(k)
        return self

    def offset(self, n: int) -> "LanceQueryBuilder":
        self._req.offset = int(n)
        return self

    def with_row_id(self, flag: bool = True) -> "LanceQueryBuilder":
        self._req.with_row_id = flag
        self._explicit_row_id = flag
        return self

    _with_row_address = False
    _explicit_row_id = False

    def with_row_address(self, flag: bool = True) -> "LanceQueryBuilder":
        """Include the ``_rowaddr`` column (reference query.py:1311).

        Row ids in this engine ARE physical addresses
        (fragment << 32 | offset — storage/dataset.py ROW_ID_COL), so
        ``_rowaddr`` mirrors ``_rowid``; the reference distinguishes
        them because lance stable row ids can move addresses."""
        self._with_row_address = flag
        if flag:
            self._req.with_row_id = True
        return self

    _fragment_ids = None

    def fragment_ids(self, fragment_ids: list[int]) -> "LanceQueryBuilder":
        """Restrict a plain scan to the given fragment ids (reference
        query.py:1332) — scanner-backed queries only."""
        self._fragment_ids = [int(f) for f in fragment_ids]
        return self

    def with_fragments(self, fragments) -> "LanceQueryBuilder":
        """Restrict a plain scan to the given fragments (reference
        query.py:1327). Accepts fragment metadata objects or ids."""
        self._fragment_ids = [
            int(getattr(f, "id", f)) for f in fragments
        ]
        return self

    _use_lsm = False

    def use_lsm(self, flag: bool = True) -> "LanceQueryBuilder":
        """Merge WAL rows over the base table (reference QueryRequest
        use_lsm, query.rs:818-887 + table/query/lsm.rs read plan).
        Honored by plain scans; search builders reject it at execution
        (the LSM read plan is a scan construct)."""
        self._use_lsm = flag
        return self

    def to_query_object(self) -> dict:
        """Serializable representation of the accumulated query
        (reference query.py:1548 to_query_object)."""
        import dataclasses

        req = dataclasses.asdict(self._req)
        req["query_vectors"] = [
            np.asarray(v).tolist() for v in req.get("query_vectors", [])
        ]
        req["query_type"] = type(self).__name__.replace("LanceQueryBuilder", "").replace(
            "Lance", "").replace("QueryBuilder", "").lower() or "empty"
        if self._fragment_ids is not None:
            req["fragment_ids"] = self._fragment_ids
        if self._use_lsm:
            req["use_lsm"] = True
        return req

    _order_by = None

    def order_by(self, *columns) -> "LanceQueryBuilder":
        """Sort output rows (reference QueryRequest.order_by,
        query.rs:818-887 — available on EVERY query surface): each item
        a column name or (name, 'asc'|'desc') pair. On search builders
        the sort applies to the k results (e.g. re-order an ANN result
        set by a metadata column)."""
        out = []
        nulls = []
        for c in columns:
            if isinstance(c, str):
                out.append((c, "ascending"))
                nulls.append(None)
            elif isinstance(c, ColumnOrdering):
                out.append((c.column_name, "ascending" if c.ascending else "descending"))
                nulls.append("first" if c.nulls_first else "last")
            else:
                name, direction = c
                out.append(
                    (name, "descending" if str(direction).lower().startswith("desc") else "ascending")
                )
                nulls.append(None)
        self._order_by = out
        self._order_nulls = nulls
        return self

    def _sort_table(self, out: pa.Table) -> pa.Table:
        nulls = getattr(self, "_order_nulls", None) or [None] * len(self._order_by)
        if not any(n == "first" for n in nulls):
            return out.sort_by(self._order_by)
        # explicit nulls-first keys need a null-flag sort key (pyarrow
        # sorts nulls last); mirrors sql.py _apply_order
        combined = out
        keys = []
        for idx, ((name, direction), n) in enumerate(zip(self._order_by, nulls)):
            col = out.column(name)
            if n == "first" and col.null_count:
                fname = f"__nullord{idx}"
                combined = combined.append_column(fname, pa.compute.is_null(col))
                keys.append((fname, "descending"))
            keys.append((name, direction))
        idxs = pa.compute.sort_indices(combined, sort_keys=keys)
        return out.take(idxs)

    def _sorted(self, out: pa.Table) -> pa.Table:
        if self._with_row_address and ROW_ID_COL in out.column_names:
            out = out.append_column("_rowaddr", out.column(ROW_ID_COL))
            if not self._explicit_row_id:
                out = out.drop_columns([ROW_ID_COL])
        if not self._order_by:
            return out
        return self._sort_table(out)

    def _check_scan_only_flags(self) -> None:
        """Search builders reject scan-only options instead of silently
        ignoring them."""
        if self._use_lsm:
            raise InvalidInputError(
                "use_lsm applies to plain scans (table.query()); search "
                "results are served from the committed base table"
            )
        if self._fragment_ids is not None:
            raise InvalidInputError(
                "fragment_ids/with_fragments apply to plain scanner-backed "
                "queries only (reference query.py:1327-1335)"
            )

    # -- outputs --
    def to_arrow(self) -> pa.Table:
        raise NotImplementedError

    def to_batches(
        self, max_batch_length: int = 1024, timeout: float | None = None
    ) -> Iterable[pa.RecordBatch]:
        """Stream results as RecordBatches of at most `max_batch_length`
        rows (reference QueryExecutionOptions, query.rs:626-648).
        Search builders produce k-bounded results, so they materialize
        then re-chunk; the plain-scan builder overrides this with a
        fragment-streaming implementation."""
        import time as _time

        start = _time.monotonic()
        for b in self.to_arrow().to_batches(max_chunksize=max_batch_length):
            if timeout is not None and _time.monotonic() - start > timeout:
                raise TimeoutError(f"query exceeded timeout={timeout}s")
            yield b

    def postfilter(self) -> "LanceQueryBuilder":
        """Apply the filter AFTER the search (reference postfilter())."""
        self._req.prefilter = False
        return self

    def to_pandas(self, flatten=None, **kwargs):
        from .arrow import flatten_columns

        return flatten_columns(self.to_arrow(), flatten).to_pandas(**kwargs)

    def to_df(self):  # reference alias
        return self.to_pandas()

    def to_table(self) -> pa.Table:  # reference alias
        return self.to_arrow()

    def to_pyarrow(self) -> pa.Table:  # reference alias
        return self.to_arrow()

    def to_json(self) -> list[dict]:
        """Rows as JSON-safe dicts (reference to_json)."""
        import json

        return json.loads(
            json.dumps(
                self.to_list(),
                default=lambda o: o.tolist() if hasattr(o, "tolist") else str(o),
            )
        )

    def to_reader(self, max_batch_length: int = 1024) -> pa.RecordBatchReader:
        """Results as a RecordBatchReader (reference to_reader)."""
        first = self.to_arrow()
        return pa.RecordBatchReader.from_batches(
            first.schema, first.to_batches(max_chunksize=max_batch_length)
        )

    def output_schema(self) -> pa.Schema:
        """Schema of the result rows (executes with limit 1)."""
        import copy

        saved = copy.deepcopy(self._req)
        try:
            self._req.k = 1
            return self.to_arrow().schema
        finally:
            self._req = saved

    def to_polars(self):
        import polars as pl  # soft dependency

        return pl.from_arrow(self.to_arrow())

    def to_list(self) -> list[dict]:
        return self.to_arrow().to_pylist()

    def to_pydantic(self, model_cls) -> list:
        return [
            model_cls(**{k: v for k, v in row.items() if k in model_cls.model_fields})
            for row in self.to_list()
        ]

    @staticmethod
    def create(
        table,
        query,
        query_type: str = "auto",
        vector_column_name: str | None = None,
        fts_columns: list[str] | None = None,
    ):
        """Type-dispatch like reference query.py:844 LanceQueryBuilder.create."""
        if query is None:
            return LanceEmptyQueryBuilder(table)
        if query_type == "hybrid" or (
            query_type == "auto" and isinstance(query, tuple) and len(query) == 2
        ):
            if isinstance(query, tuple):
                vec, text = query
            else:
                vec, text = None, query
            return LanceHybridQueryBuilder(table, text, vec, vector_column_name, fts_columns)
        if isinstance(query, str):
            if query_type == "auto":
                # reference query.py:931-968: a string query embeds through
                # the table's embedding function when one is registered and
                # no FTS index exists; otherwise it is full-text search
                has_fts = any(
                    ix.index_type == "FTS" for ix in table._dataset.manifest.indices
                )
                if not has_fts and table.embedding_functions:
                    vec = table._embed_query(query, vector_column_name)
                    return LanceVectorQueryBuilder(table, vec, vector_column_name)
                return LanceFtsQueryBuilder(table, query, fts_columns)
            if query_type == "fts":
                return LanceFtsQueryBuilder(table, query, fts_columns)
            if query_type == "vector":
                # embed text through the table's embedding function
                vec = table._embed_query(query, vector_column_name)
                return LanceVectorQueryBuilder(table, vec, vector_column_name)
            raise InvalidInputError(f"unknown query_type {query_type!r}")
        from .query_fts import FtsQueryNode  # AST query objects

        if isinstance(query, FtsQueryNode):
            return LanceFtsQueryBuilder(table, query, fts_columns)
        return LanceVectorQueryBuilder(table, query, vector_column_name)


def _coerce_query_vectors(query) -> list[np.ndarray]:
    """Query vector input → list of f32 vectors (reference
    IntoQueryVector, query.rs:131-374): one vector, a batch (list of
    lists / 2D array), or a multivector token bag."""
    if isinstance(query, (list, tuple)) and query and isinstance(
        query[0], (list, tuple, np.ndarray)
    ):
        return [np.asarray(q, dtype=np.float32) for q in query]
    if isinstance(query, np.ndarray) and query.ndim == 2:
        return [np.asarray(row, dtype=np.float32) for row in query]
    return [np.asarray(query, dtype=np.float32)]


class LanceVectorQueryBuilder(LanceQueryBuilder):
    """Vector (ANN/KNN) search builder (reference query.py:1559)."""

    def __init__(self, table, query, vector_column_name: str | None = None):
        super().__init__(table)
        self._req.query_vectors = _coerce_query_vectors(query)
        self._req.column = vector_column_name

    def vector(self, vector) -> "LanceVectorQueryBuilder":
        """Replace the query vector(s) (reference query.py vector())."""
        self._req.query_vectors = _coerce_query_vectors(vector)
        return self

    def metric(self, metric: str) -> "LanceVectorQueryBuilder":
        self._req.distance_type = normalize_metric(metric)
        return self

    distance_type = metric

    def column(self, name: str) -> "LanceVectorQueryBuilder":
        """Search a specific vector column (reference column())."""
        self._req.column = name
        return self

    def nprobes(self, n: int) -> "LanceVectorQueryBuilder":
        self._req.minimum_nprobes = int(n)
        self._req.maximum_nprobes = int(n)
        return self

    def minimum_nprobes(self, n: int) -> "LanceVectorQueryBuilder":
        self._req.minimum_nprobes = int(n)
        return self

    def maximum_nprobes(self, n: int) -> "LanceVectorQueryBuilder":
        self._req.maximum_nprobes = int(n)
        return self

    def refine_factor(self, rf: int) -> "LanceVectorQueryBuilder":
        self._req.refine_factor = int(rf)
        return self

    def distance_range(
        self, lower_bound: float | None = None, upper_bound: float | None = None
    ) -> "LanceVectorQueryBuilder":
        self._req.lower_bound = lower_bound
        self._req.upper_bound = upper_bound
        return self

    def ef(self, ef: int) -> "LanceVectorQueryBuilder":
        self._req.ef = int(ef)
        return self

    def bypass_vector_index(self) -> "LanceVectorQueryBuilder":
        self._req.use_index = False
        return self

    def fast_search(self) -> "LanceVectorQueryBuilder":
        self._req.fast_search = True
        return self

    def precision(self, p: str) -> "LanceVectorQueryBuilder":
        self._req.precision = p
        return self

    def to_arrow(self) -> pa.Table:
        self._check_scan_only_flags()
        out = execute_vector_query(self._table, self._req)
        reranker = getattr(self, "_reranker", None)
        if reranker is not None:
            needs_rowid = ROW_ID_COL not in out.column_names
            if needs_rowid:
                self._req.with_row_id = True
                out = execute_vector_query(self._table, self._req)
            out = reranker.rerank_vector(getattr(self, "_query_string", "") or "", out)
            out = out.slice(0, self._req.k)
            if needs_rowid and ROW_ID_COL in out.column_names:
                out = out.drop_columns([ROW_ID_COL])
        return self._sorted(out)

    def explain_plan(self, verbose: bool = False) -> str:
        return explain_vector_plan(self._table, self._req)

    def analyze_plan(self) -> str:
        return analyze_vector_plan(self._table, self._req)

    def rerank(self, reranker) -> "LanceVectorQueryBuilder":
        self._reranker = reranker
        return self


class LanceEmptyQueryBuilder(LanceQueryBuilder):
    """Plain scan (no search) — filters/projection/limit only."""

    def nearest_to(self, vector) -> "LanceVectorQueryBuilder":
        """Switch to a vector search (reference nearest_to)."""
        b = LanceVectorQueryBuilder(self._table, vector, self._req.column)
        b._req.filter = self._req.filter
        b._req.prefilter = self._req.prefilter
        b._req.select = self._req.select
        # scan-only flags travel so the search consistently REJECTS them
        # instead of silently dropping (same error as setting them after)
        b._use_lsm = self._use_lsm
        b._fragment_ids = self._fragment_ids
        return b

    def nearest_to_text(self, text: str, columns: list[str] | None = None) -> "LanceFtsQueryBuilder":
        """Switch to a full-text search (reference nearest_to_text)."""
        b = LanceFtsQueryBuilder(self._table, text, columns)
        b._req.filter = self._req.filter
        b._req.prefilter = self._req.prefilter
        b._req.select = self._req.select
        b._use_lsm = self._use_lsm
        b._fragment_ids = self._fragment_ids
        return b

    def to_arrow(self) -> pa.Table:
        ds = self._table._dataset
        cols = _selected_columns(self._table, self._req)
        # plain scans are unlimited unless .limit() was called explicitly
        limit = self._req.k if getattr(self, "_limit_set", False) else None
        if self._use_lsm:
            if self._fragment_ids is not None:
                raise InvalidInputError(
                    "fragment_ids cannot combine with use_lsm: WAL rows are "
                    "not committed to fragments yet"
                )
            return self._lsm_scan(cols, limit)
        # sorting changes which rows the limit keeps → push limit down
        # only for unsorted scans
        out = ds.to_table(
            columns=cols,
            predicate=self._req.filter,
            limit=None if self._order_by else limit,
            offset=0 if self._order_by else self._req.offset,
            with_row_id=self._req.with_row_id,
            fragments=self._fragment_ids,
        )
        if isinstance(self._req.select, dict):
            arrays = {a: evaluate_expression(out, e) for a, e in self._req.select.items()}
            out = pa.table(arrays)
        if self._order_by:
            out = self._sort_table(out)
            if self._req.offset:
                out = out.slice(self._req.offset)
            if limit is not None:
                out = out.slice(0, limit)
        if self._with_row_address and ROW_ID_COL in out.column_names:
            out = out.append_column("_rowaddr", out.column(ROW_ID_COL))
            if not self._explicit_row_id:
                out = out.drop_columns([ROW_ID_COL])
        return out

    def _lsm_scan(self, cols, limit) -> pa.Table:
        """Base rows (PK-overridden rows dropped) + live WAL rows."""
        ds = self._table._dataset
        lsm = self._table._lsm
        spec = lsm.get_spec()
        wal = lsm.wal_rows() if spec is not None else None
        keys = spec.key_columns if spec is not None else []
        read_cols = None
        if cols is not None:
            read_cols = sorted(set(cols) | set(keys))
        base = ds.to_table(
            columns=read_cols, predicate=self._req.filter, with_row_id=self._req.with_row_id
        )
        if wal is not None and wal.num_rows:
            wal_keys = set(zip(*[wal.column(c).to_pylist() for c in keys]))
            base_keys = list(zip(*[base.column(c).to_pylist() for c in keys]))
            keep = np.asarray([k not in wal_keys for k in base_keys], dtype=bool)
            base = base.filter(pa.array(keep)) if not keep.all() else base
            if self._req.filter is not None:
                mask = evaluate_predicate_mask(wal, self._req.filter)
                wal = wal.filter(pa.array(mask))
            if self._req.with_row_id:
                # WAL rows are not committed yet → sentinel row ids
                wal = wal.append_column(
                    ROW_ID_COL,
                    pa.array(np.full(wal.num_rows, _INVALID_ROWID, dtype=np.uint64)),
                )
            base = pa.concat_tables(
                [base, wal.select(base.column_names)], promote_options="default"
            )
        if cols is not None:
            want = list(cols) + ([ROW_ID_COL] if self._req.with_row_id else [])
            base = base.select(want)
        if isinstance(self._req.select, dict):
            base = pa.table({a: evaluate_expression(base, e) for a, e in self._req.select.items()})
        if self._req.offset:
            base = base.slice(self._req.offset)
        if limit is not None:
            base = base.slice(0, limit)
        return base

    def to_batches(
        self, max_batch_length: int = 1024, timeout: float | None = None
    ) -> Iterable[pa.RecordBatch]:
        """True streaming scan: one fragment resident at a time, so an
        unlimited scan of a huge table runs in bounded host memory.
        Sorted/LSM/fragment-scoped/row-address scans need result-level
        post-processing and fall back to the materializing base
        implementation."""
        if (
            self._order_by
            or self._use_lsm
            or self._fragment_ids is not None
            or self._with_row_address
        ):
            yield from super().to_batches(max_batch_length, timeout)
            return
        import time as _time

        start = _time.monotonic()
        ds = self._table._dataset
        cols = _selected_columns(self._table, self._req)
        limit = self._req.k if getattr(self, "_limit_set", False) else None
        dyn = self._req.select if isinstance(self._req.select, dict) else None
        for batch in ds.scan_batches(
            columns=cols,
            predicate=self._req.filter,
            limit=limit,
            offset=self._req.offset,
            with_row_id=self._req.with_row_id,
            max_batch_length=max_batch_length,
        ):
            if timeout is not None and _time.monotonic() - start > timeout:
                raise TimeoutError(f"query exceeded timeout={timeout}s")
            if dyn is not None:
                tb = pa.Table.from_batches([batch])
                batch = pa.table(
                    {a: evaluate_expression(tb, e) for a, e in dyn.items()}
                ).combine_chunks().to_batches()[0]
            yield batch

    def explain_plan(self, verbose: bool = False) -> str:
        return (
            f"ProjectionExec: columns={self._req.select or 'all'}\n"
            f"  ScanExec: filter=[{self._req.filter}] limit={self._req.k}"
        )


class LanceFtsQueryBuilder(LanceQueryBuilder):
    """Full-text (BM25) search builder (reference query.py:1971)."""

    def __init__(self, table, query, fts_columns: list[str] | None = None):
        super().__init__(table)
        self._query = query
        self._fts_columns = fts_columns

    def rerank(self, reranker) -> "LanceFtsQueryBuilder":
        self._reranker = reranker
        return self

    def text(self, query) -> "LanceFtsQueryBuilder":
        """Replace the FTS query (reference query.py text())."""
        self._query = query
        return self

    def get_query(self):
        """The query text or FTS AST node (reference query.py:3458)."""
        return self._query

    def to_query_object(self) -> dict:
        obj = super().to_query_object()
        obj["query_type"] = "fts"
        q = self._query
        obj["full_text_query"] = q.to_json() if hasattr(q, "to_json") else {
            "query": str(q), "columns": self._fts_columns,
        }
        return obj

    def phrase_query(self, flag: bool = True) -> "LanceFtsQueryBuilder":
        """Treat the query text as an exact phrase (reference
        phrase_query())."""
        if flag and isinstance(self._query, str):
            from .query_fts import PhraseQuery

            self._query = PhraseQuery(self._query, column=None)
        return self

    def to_arrow(self) -> pa.Table:
        self._check_scan_only_flags()
        reranker = getattr(self, "_reranker", None)
        out = self._table._execute_fts(
            self._query,
            columns=self._fts_columns,
            k=self._req.k,
            offset=self._req.offset,
            filter=self._req.filter,
            prefilter=self._req.prefilter,
            select=self._req.select,
            with_row_id=self._req.with_row_id or reranker is not None,
        )
        if reranker is not None:
            out = reranker.rerank_fts(str(self._query), out).slice(0, self._req.k)
            if not self._req.with_row_id and ROW_ID_COL in out.column_names:
                out = out.drop_columns([ROW_ID_COL])
        return self._sorted(out)

    def explain_plan(self, verbose: bool = False) -> str:
        return (
            f"ProjectionExec: +[_score]\n  SortExec: _score DESC limit={self._req.k}\n"
            f"    FtsExec: BM25 query={self._query!r} filter=[{self._req.filter}]"
        )


class LanceHybridQueryBuilder(LanceQueryBuilder):
    """Hybrid = FTS ∥ vector, normalized + fused by a reranker
    (reference query.py:2146 + rust execute_hybrid query.rs:1372-1445)."""

    def __init__(self, table, text_query, vector_query=None, vector_column_name=None, fts_columns=None):
        super().__init__(table)
        self._text_query = text_query
        # embedding is LAZY: .vector() may replace the leg before
        # execution, and tables without an embedding function can still
        # build hybrid queries that way
        self._vector = (
            np.asarray(vector_query, dtype=np.float32)
            if vector_query is not None
            else None
        )
        self._vector_column = vector_column_name
        self._fts_columns = fts_columns
        self._reranker = None
        self._norm = "score"
        self._vq_opts: dict[str, Any] = {}
        # extra (vector, text) pairs beyond the first — one fused
        # device dispatch executes every vector leg (the hybrid analog
        # of the reference's multi-query-vector union, table/query.rs:334)
        self._extra_queries: list[tuple[Any, Any]] = []

    def add_query(self, vector=None, text=None) -> "LanceHybridQueryBuilder":
        """Add another (vector, text) hybrid query to this builder.

        All vector legs execute as ONE batched device dispatch (queries
        are rows of the Q matrix on the MXU) and the FTS legs run
        concurrently on host threads; results carry a ``query_index``
        column, mirroring the reference's multi-query-vector union
        semantics (reference table/query.rs:334 create_multi_vector_plan).
        """
        if vector is None and text is None:
            raise InvalidInputError("add_query needs a vector and/or text")
        self._extra_queries.append((vector, text if text is not None else self._text_query))
        return self

    def rerank(self, reranker=None, normalize: str = "score") -> "LanceHybridQueryBuilder":
        self._reranker = reranker
        self._norm = normalize
        return self

    def nprobes(self, n: int) -> "LanceHybridQueryBuilder":
        self._vq_opts["nprobes"] = n
        return self

    def minimum_nprobes(self, n: int) -> "LanceHybridQueryBuilder":
        self._vq_opts["minimum_nprobes"] = n
        return self

    def maximum_nprobes(self, n: int) -> "LanceHybridQueryBuilder":
        self._vq_opts["maximum_nprobes"] = n
        return self

    def distance_range(
        self, lower_bound: float | None = None, upper_bound: float | None = None
    ) -> "LanceHybridQueryBuilder":
        """Bound the vector leg's distances before fusion (reference
        hybrid distance_range, test_hybrid_query.py:219)."""
        self._vq_opts["distance_range"] = (lower_bound, upper_bound)
        return self

    def ef(self, ef: int) -> "LanceHybridQueryBuilder":
        self._vq_opts["ef"] = ef
        return self

    def refine_factor(self, rf: int) -> "LanceHybridQueryBuilder":
        self._vq_opts["refine_factor"] = rf
        return self

    def metric(self, m: str) -> "LanceHybridQueryBuilder":
        self._vq_opts["metric"] = m
        return self

    def distance_type(self, m: str) -> "LanceHybridQueryBuilder":
        """Alias of metric() (reference hybrid distance_type)."""
        return self.metric(m)

    def text(self, query) -> "LanceHybridQueryBuilder":
        """Replace the FTS leg's query (reference hybrid text())."""
        self._text_query = query
        return self

    def vector(self, vector) -> "LanceHybridQueryBuilder":
        """Replace the vector leg's query vector (reference hybrid
        vector())."""
        self._vector = np.asarray(vector, dtype=np.float32)
        return self

    def to_query_object(self) -> dict:
        obj = super().to_query_object()
        obj["query_type"] = "hybrid"
        obj["query_vectors"] = (
            [np.asarray(self._vector).tolist()] if self._vector is not None else []
        )
        q = self._text_query
        obj["full_text_query"] = q.to_json() if hasattr(q, "to_json") else {
            "query": str(q), "columns": self._fts_columns,
        }
        obj["vector_options"] = dict(self._vq_opts)
        return obj

    def _vector_leg(self, query_vectors) -> "LanceVectorQueryBuilder":
        vq = LanceVectorQueryBuilder(self._table, query_vectors, self._vector_column)
        vq._req.filter = self._req.filter
        vq._req.prefilter = self._req.prefilter
        vq._req.k = self._req.k
        vq._req.with_row_id = True
        if "nprobes" in self._vq_opts:
            vq.nprobes(self._vq_opts["nprobes"])
        if "minimum_nprobes" in self._vq_opts:
            vq.minimum_nprobes(self._vq_opts["minimum_nprobes"])
        if "maximum_nprobes" in self._vq_opts:
            vq.maximum_nprobes(self._vq_opts["maximum_nprobes"])
        if "distance_range" in self._vq_opts:
            vq.distance_range(*self._vq_opts["distance_range"])
        if "ef" in self._vq_opts:
            vq.ef(self._vq_opts["ef"])
        if "refine_factor" in self._vq_opts:
            vq.refine_factor(self._vq_opts["refine_factor"])
        if "metric" in self._vq_opts:
            vq.metric(self._vq_opts["metric"])
        return vq

    def _fts_leg(self, text_query) -> pa.Table:
        fts = LanceFtsQueryBuilder(self._table, text_query, self._fts_columns)
        fts._req.filter = self._req.filter
        fts._req.prefilter = self._req.prefilter
        fts._req.k = self._req.k
        fts._req.with_row_id = True
        return fts.to_arrow()

    def _to_arrow_batched(self) -> pa.Table:
        """Execute every (vector, text) pair in this builder at once:
        the vector legs stack into ONE device dispatch (rows of the Q
        matrix on the MXU — amortizes the host→device round trip that
        dominates single-query hybrid latency) and the FTS legs fan out
        on host threads (the native DAAT scorers release the GIL).
        Results carry a ``query_index`` column, mirroring the
        reference's multi-query-vector union (table/query.rs:334)."""
        from concurrent.futures import ThreadPoolExecutor

        from .rerankers.rrf import RRFReranker

        pairs = [(self._vector, self._text_query)] + list(self._extra_queries)
        vectors, texts = [], []
        for vec, txt in pairs:
            if vec is None:
                vec = self._table._embed_query(txt, self._vector_column)
            vectors.append(np.asarray(vec, dtype=np.float32).reshape(-1))
            texts.append(txt)
        k = self._req.k

        vq = self._vector_leg(np.stack(vectors))
        with ThreadPoolExecutor(
            max_workers=min(8, len(texts)), thread_name_prefix="hybrid-fts"
        ) as ex:
            fts_futures = [ex.submit(self._fts_leg, t) for t in texts]
            vector_all = vq.to_arrow()
            fts_results = [f.result() for f in fts_futures]

        reranker = self._reranker or RRFReranker()
        qidx = vector_all.column(QUERY_INDEX_COL).to_numpy(zero_copy_only=False)
        parts = []
        for qi, (txt, fts_res) in enumerate(zip(texts, fts_results)):
            vres = vector_all.filter(pa.array(qidx == qi)).drop_columns(
                [QUERY_INDEX_COL]
            )
            fused = reranker.rerank_hybrid(str(txt), vres, fts_res).slice(0, k)
            fused = self._sorted(fused)
            fused = fused.append_column(
                QUERY_INDEX_COL, pa.array(np.full(len(fused), qi, dtype=np.int32))
            )
            parts.append(fused)
        out = pa.concat_tables(parts, promote_options="permissive")
        if not self._req.with_row_id and ROW_ID_COL in out.column_names:
            out = out.drop_columns([ROW_ID_COL])
        if self._req.select is not None and not isinstance(self._req.select, dict):
            keep = [
                c
                for c in out.column_names
                if c
                in set(self._req.select)
                | {DIST_COL, SCORE_COL, RELEVANCE_COL, ROW_ID_COL, QUERY_INDEX_COL}
            ]
            out = out.select(keep)
        return out

    def to_arrow(self) -> pa.Table:
        self._check_scan_only_flags()
        from .rerankers.rrf import RRFReranker

        if self._extra_queries:
            return self._to_arrow_batched()
        if self._vector is None:
            self._vector = self._table._embed_query(
                self._text_query, self._vector_column
            )
        k = self._req.k
        vq = self._vector_leg(self._vector)

        # the two legs are independent: the FTS leg (host/native DAAT)
        # overlaps the vector leg's device dispatch instead of queuing
        # behind it (reference executes the legs concurrently too —
        # query.rs:1372-1445 execute_hybrid join!s both futures)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1, thread_name_prefix="hybrid-fts") as ex:
            fts_future = ex.submit(self._fts_leg, self._text_query)
            vector_results = vq.to_arrow()
            fts_results = fts_future.result()

        reranker = self._reranker or RRFReranker()
        fused = reranker.rerank_hybrid(str(self._text_query), vector_results, fts_results)
        fused = fused.slice(0, k)
        if not self._req.with_row_id and ROW_ID_COL in fused.column_names:
            fused = fused.drop_columns([ROW_ID_COL])
        if self._req.select is not None and not isinstance(self._req.select, dict):
            keep = [c for c in fused.column_names if c in set(self._req.select) | {DIST_COL, SCORE_COL, RELEVANCE_COL, ROW_ID_COL}]
            fused = fused.select(keep)
        return self._sorted(fused)
