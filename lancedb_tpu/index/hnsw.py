"""HNSW graph indexes: IVF_HNSW_FLAT / IVF_HNSW_SQ / IVF_HNSW_PQ.

Reference: lance's HNSW build (m=20, ef_construction=300 defaults —
index/vector.rs:402-415) exposed through lancedb's IvfHnsw* builders
(index.rs:78-102).

TPU-design note: graph walks are pointer-chasing — hostile to the MXU
— so HNSW here is a HOST structure (numpy-vectorized batch distance
evaluations) provided for API/recall parity and low-latency single-
query serving; the TPU-native path for throughput is the IVF family.
Storage variants quantize the vectors the walk reads:

  FLAT — raw f32; SQ — int8 affine; PQ — codes + per-query ADC LUT.
"""

from __future__ import annotations

import heapq
import io
import json
import time

import numpy as np

from ..errors import InvalidInputError
from ..ops.distance import normalize_metric
from ..ops.pq import adc_lut, default_num_sub_vectors, pq_encode, pq_train
from ..storage.manifest import IndexMeta, new_uuid
from .vector import PAD_PENALTY, SearchParams, _load_npy, _save_npy, _collect_vectors

DEFAULT_M = 20  # reference index/vector.rs:402
DEFAULT_EF_CONSTRUCTION = 300  # reference index/vector.rs:415
DEFAULT_EF_SEARCH = 64


class _HnswGraph:
    """Multi-layer navigable small-world graph over row indices."""

    def __init__(self, m: int, ef_construction: int, seed: int = 0):
        self.m = m
        self.m0 = 2 * m
        self.ef_c = ef_construction
        self.ml = 1.0 / np.log(m)
        self.rng = np.random.default_rng(seed)
        self.levels: list[int] = []
        # neighbors[level][node] -> list of node ids
        self.neighbors: list[dict[int, list[int]]] = []
        self.entry: int = -1
        self.max_level: int = -1

    def _random_level(self) -> int:
        return int(-np.log(self.rng.uniform(1e-12, 1.0)) * self.ml)

    def _search_layer(self, dist_fn, query_idx_dists, entry: int, ef: int, level: int):
        """Greedy best-first search in one layer → list of (dist, node)."""
        d0 = dist_fn(np.array([entry]))[0]
        visited = {entry}
        candidates = [(d0, entry)]  # min-heap
        results = [(-d0, entry)]  # max-heap of size ef
        adj = self.neighbors[level]
        while candidates:
            d, node = heapq.heappop(candidates)
            if d > -results[0][0]:
                break
            neigh = [n for n in adj.get(node, ()) if n not in visited]
            if not neigh:
                continue
            visited.update(neigh)
            dists = dist_fn(np.asarray(neigh))
            for nd, nn in zip(dists, neigh):
                if len(results) < ef or nd < -results[0][0]:
                    heapq.heappush(candidates, (nd, nn))
                    heapq.heappush(results, (-nd, nn))
                    if len(results) > ef:
                        heapq.heappop(results)
        return sorted((-nd, nn) for nd, nn in results)

    def insert(self, idx: int, dist_fn) -> None:
        level = self._random_level()
        self.levels.append(level)
        while self.max_level < level:
            self.neighbors.append({})
            self.max_level += 1
            if self.entry < 0:
                self.entry = idx
        for lv in range(level + 1):
            self.neighbors[lv].setdefault(idx, [])
        if self.entry == idx:
            return
        ep = self.entry
        # descend from the top to level+1 greedily (ef=1)
        for lv in range(self.max_level, level, -1):
            res = self._search_layer(dist_fn, None, ep, 1, lv)
            ep = res[0][1]
        # insert at each level ≤ node level
        for lv in range(min(level, self.max_level), -1, -1):
            res = self._search_layer(dist_fn, None, ep, self.ef_c, lv)
            m_max = self.m0 if lv == 0 else self.m
            selected = [n for _, n in res[: self.m]]
            self.neighbors[lv][idx] = selected
            for n in selected:
                lst = self.neighbors[lv].setdefault(n, [])
                lst.append(idx)
                if len(lst) > m_max:
                    # cheap prune: keep the first m_max links (insertion
                    # order favors older, well-established neighbors —
                    # the full distance-based heuristic is a later
                    # optimization, recall is governed by ef_search)
                    del lst[m_max:]
            ep = res[0][1]
        if level > self.levels[self.entry]:
            self.entry = idx


class _Storage:
    """Vector storage variants the graph walk reads."""

    def __init__(self, kind: str, metric: str):
        self.kind = kind
        self.metric = metric

    # build-time
    @staticmethod
    def build(kind: str, vectors: np.ndarray, metric: str, config) -> "_Storage":
        s = _Storage(kind, metric)
        if metric == "cosine":
            vectors = vectors / np.maximum(np.linalg.norm(vectors, axis=1, keepdims=True), 1e-30)
        if kind == "FLAT":
            s.vectors = vectors.astype(np.float32)
        elif kind == "SQ":
            lo, hi = vectors.min(0), vectors.max(0)
            s.scale = np.maximum((hi - lo) / 255.0, 1e-12).astype(np.float32)
            s.offset = lo.astype(np.float32)
            s.codes = np.clip(np.round((vectors - lo) / s.scale), 0, 255).astype(np.uint8)
        elif kind == "PQ":
            nsub = getattr(config, "num_sub_vectors", None) or default_num_sub_vectors(
                vectors.shape[1]
            )
            s.codebooks = pq_train(vectors, nsub, seed=getattr(config, "seed", 0) if hasattr(config, "seed") else 0)
            s.codes = pq_encode(vectors, s.codebooks)
        else:
            raise InvalidInputError(f"unknown HNSW storage {kind!r}")
        return s

    def num_rows(self) -> int:
        if self.kind == "FLAT":
            return len(self.vectors)
        return len(self.codes)

    # query-time: returns dist_fn(idx_array) for one query
    def query_fn(self, q: np.ndarray):
        metric = self.metric
        if metric == "cosine":
            q = q / max(np.linalg.norm(q), 1e-30)
        if self.kind == "FLAT":
            vecs = self.vectors

            def fn(idx):
                sub = vecs[idx]
                if metric == "dot":
                    return -(sub @ q)
                d = sub - q[None, :]
                out = np.einsum("nd,nd->n", d, d)
                return out / 2.0 if metric == "cosine" else out

            return fn
        if self.kind == "SQ":
            codes, scale, offset = self.codes, self.scale, self.offset

            def fn(idx):
                sub = codes[idx].astype(np.float32) * scale + offset
                if metric == "dot":
                    return -(sub @ q)
                d = sub - q[None, :]
                out = np.einsum("nd,nd->n", d, d)
                return out / 2.0 if metric == "cosine" else out

            return fn
        # PQ: per-query ADC lookup table
        import jax.numpy as jnp

        luts = np.asarray(adc_lut(jnp.asarray(q[None, :]), jnp.asarray(self.codebooks)))[0]
        codes = self.codes
        nsub = codes.shape[1]
        cols = np.arange(nsub)

        def fn(idx):
            c = codes[idx]
            out = luts[cols[None, :], c].sum(axis=1)
            if metric == "dot":
                # approximate: l2-trained codes; dot falls back to l2 order
                return out
            return out / 2.0 if metric == "cosine" else out

        return fn

    # persistence
    def save(self, store, prefix: str):
        if self.kind == "FLAT":
            _save_npy(store, f"{prefix}/vectors.npy", self.vectors)
        elif self.kind == "SQ":
            _save_npy(store, f"{prefix}/codes.npy", self.codes)
            _save_npy(store, f"{prefix}/sq_scale.npy", self.scale)
            _save_npy(store, f"{prefix}/sq_offset.npy", self.offset)
        else:
            _save_npy(store, f"{prefix}/codes.npy", self.codes)
            _save_npy(store, f"{prefix}/codebooks.npy", self.codebooks)

    @staticmethod
    def load(store, prefix: str, kind: str, metric: str) -> "_Storage":
        s = _Storage(kind, metric)
        if kind == "FLAT":
            s.vectors = np.asarray(_load_npy(store, f"{prefix}/vectors.npy"))
        elif kind == "SQ":
            s.codes = np.asarray(_load_npy(store, f"{prefix}/codes.npy"))
            s.scale = np.asarray(_load_npy(store, f"{prefix}/sq_scale.npy"))
            s.offset = np.asarray(_load_npy(store, f"{prefix}/sq_offset.npy"))
        else:
            s.codes = np.asarray(_load_npy(store, f"{prefix}/codes.npy"))
            s.codebooks = np.asarray(_load_npy(store, f"{prefix}/codebooks.npy"))
        return s


def build_hnsw_index(dataset, column: str, config, name: str | None = None) -> IndexMeta:
    """Build the graph + quantized storage; persist as CSR arrays."""
    t0 = time.time()
    metric = normalize_metric(config.distance_type)
    kind = {"IVF_HNSW_FLAT": "FLAT", "IVF_HNSW_SQ": "SQ", "IVF_HNSW_PQ": "PQ"}[config.index_type]
    vectors, row_ids, frag_ids = _collect_vectors(dataset, column)
    storage = _Storage.build(kind, vectors, metric, config)
    graph = _HnswGraph(config.m, config.ef_construction)
    n = storage.num_rows()
    for i in range(n):
        # dist_fn measures candidates against node i's own vector
        if kind == "FLAT":
            qv = storage.vectors[i]
        elif kind == "SQ":
            qv = storage.codes[i].astype(np.float32) * storage.scale + storage.offset
        else:
            qv = vectors[i]
        graph.insert(i, storage.query_fn(qv))
    uuid = new_uuid()
    store = dataset.store
    prefix = dataset.index_dir(uuid)
    storage.save(store, prefix)
    _save_npy(store, f"{prefix}/row_ids.npy", row_ids.view(np.int64))
    # CSR per level
    for lv, adj in enumerate(graph.neighbors):
        offsets = np.zeros(n + 1, dtype=np.int64)
        targets = []
        for node in range(n):
            lst = adj.get(node, [])
            offsets[node + 1] = offsets[node] + len(lst)
            targets.extend(lst)
        _save_npy(store, f"{prefix}/level{lv}_offsets.npy", offsets)
        _save_npy(store, f"{prefix}/level{lv}_targets.npy", np.asarray(targets, dtype=np.int32))
    meta_doc = {
        "index_type": config.index_type,
        "column": column,
        "metric": metric,
        "dim": vectors.shape[1],
        "num_rows": n,
        "m": config.m,
        "ef_construction": config.ef_construction,
        "num_levels": len(graph.neighbors),
        "entry": int(graph.entry),
        "build_seconds": time.time() - t0,
    }
    store.write_bytes(f"{prefix}/meta.json", json.dumps(meta_doc).encode())
    return IndexMeta(
        name=name or f"{column}_idx",
        uuid=uuid,
        columns=[column],
        index_type=config.index_type,
        params=meta_doc,
        fragment_ids=frag_ids,
        num_indexed_rows=n,
        created_at=time.time(),
    )


class HnswSearcher:
    """Loaded HNSW index serving queries with the VectorSearcher contract."""

    def __init__(self, store, prefix: str, meta: IndexMeta):
        self.meta = meta
        self.params = json.loads(store.read_bytes(f"{prefix}/meta.json"))
        self.metric = self.params["metric"]
        self.index_type = self.params["index_type"]
        self.dim = self.params["dim"]
        kind = {"IVF_HNSW_FLAT": "FLAT", "IVF_HNSW_SQ": "SQ", "IVF_HNSW_PQ": "PQ"}[self.index_type]
        self.storage = _Storage.load(store, prefix, kind, self.metric)
        self.row_ids_flat = np.asarray(_load_npy(store, f"{prefix}/row_ids.npy")).view(np.uint64)
        self.num_slots = len(self.row_ids_flat)
        self.entry = self.params["entry"]
        self.levels = []
        for lv in range(self.params["num_levels"]):
            self.levels.append(
                (
                    np.asarray(_load_npy(store, f"{prefix}/level{lv}_offsets.npy")),
                    np.asarray(_load_npy(store, f"{prefix}/level{lv}_targets.npy")),
                )
            )

    def _adj(self, level: int, node: int) -> np.ndarray:
        offs, tgts = self.levels[level]
        return tgts[offs[node] : offs[node + 1]]

    def slot_penalty(self, allowed_row_ids, deleted_row_ids, vanished_fragments=None):
        no_deleted = deleted_row_ids is None or not len(deleted_row_ids)
        if allowed_row_ids is None and no_deleted and not vanished_fragments:
            return None
        penalty = np.zeros(self.num_slots, dtype=np.float32)
        rid = self.row_ids_flat
        if allowed_row_ids is not None:
            penalty[~np.isin(rid, allowed_row_ids)] = PAD_PENALTY
        if not no_deleted:
            penalty[np.isin(rid, deleted_row_ids)] = PAD_PENALTY
        if vanished_fragments:
            frag_of = (rid >> np.uint64(32)).astype(np.int64)
            penalty[np.isin(frag_of, np.fromiter(vanished_fragments, dtype=np.int64))] = PAD_PENALTY
        return penalty

    def search(self, queries: np.ndarray, params: SearchParams, slot_penalty=None):
        q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        k = params.k
        ef = max(getattr(params, "ef", None) or DEFAULT_EF_SEARCH, k)
        out_d = np.full((len(q), k), np.inf, dtype=np.float32)
        out_r = np.full((len(q), k), np.uint64(np.iinfo(np.uint64).max), dtype=np.uint64)
        blocked = slot_penalty is not None and slot_penalty.max() > 0
        for qi in range(len(q)):
            dist_fn = self.storage.query_fn(q[qi])
            ep = self.entry
            for lv in range(len(self.levels) - 1, 0, -1):
                ep = self._greedy(dist_fn, ep, lv)
            res = self._search_layer0(dist_fn, ep, max(ef, k * 3 if blocked else ef), slot_penalty)
            res = res[:k]
            for j, (d, node) in enumerate(res):
                out_d[qi, j] = d
                out_r[qi, j] = self.row_ids_flat[node]
        return out_d, out_r

    def _greedy(self, dist_fn, ep: int, level: int) -> int:
        cur = ep
        cur_d = dist_fn(np.array([cur]))[0]
        improved = True
        while improved:
            improved = False
            neigh = self._adj(level, cur)
            if len(neigh) == 0:
                break
            dists = dist_fn(neigh)
            j = int(np.argmin(dists))
            if dists[j] < cur_d:
                cur, cur_d = int(neigh[j]), dists[j]
                improved = True
        return cur

    def _search_layer0(self, dist_fn, ep: int, ef: int, penalty):
        import heapq as hq

        d0 = dist_fn(np.array([ep]))[0]
        visited = {ep}
        candidates = [(d0, ep)]
        results = [(-self._pen(d0, ep, penalty), ep)]
        while candidates:
            d, node = hq.heappop(candidates)
            if d > -results[0][0] and len(results) >= ef:
                break
            neigh = [n for n in self._adj(0, node) if n not in visited]
            if not neigh:
                continue
            visited.update(neigh)
            dists = dist_fn(np.asarray(neigh))
            for nd, nn in zip(dists, neigh):
                pd = self._pen(nd, nn, penalty)
                if len(results) < ef or pd < -results[0][0]:
                    hq.heappush(candidates, (nd, int(nn)))
                    hq.heappush(results, (-pd, int(nn)))
                    if len(results) > ef:
                        hq.heappop(results)
        out = sorted((-nd, nn) for nd, nn in results)
        return [(d, n) for d, n in out if d < PAD_PENALTY / 2]

    @staticmethod
    def _pen(d, node, penalty):
        if penalty is None:
            return d
        return d + penalty[node]

    def refine(self, dataset, column, queries, dists, row_ids, k):
        from .vector import VectorSearcher

        return VectorSearcher.refine(self, dataset, column, queries, dists, row_ids, k)  # type: ignore[arg-type]
