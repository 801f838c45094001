"""HNSW graph indexes: IVF_HNSW_FLAT / IVF_HNSW_SQ / IVF_HNSW_PQ.

Reference: lance's HNSW build (m=20, ef_construction=300 defaults —
index/vector.rs:402-415) exposed through lancedb's IvfHnsw* builders
(index.rs:78-102).

TPU-design note: the classic incremental HNSW insert is pointer
chasing — hostile to the MXU and O(n·ef·m) Python-side. The build
here is batch-first (CAGRA-style): every layer's adjacency is derived
from an EXACT kNN graph computed with blocked device matmuls
(``ops.topk.blocked_topk_scan``), plus degree-capped reverse edges
for reachability. That turns the build into n/Q_CHUNK large MXU
matmuls instead of n Python graph walks, and exact kNN edges dominate
the quality any ef_construction beam search could reach. Query-time
graph walks stay a HOST structure (numpy-vectorized distance evals)
for low-latency single-query serving; the TPU throughput path is the
IVF family. Storage variants quantize the vectors the walk reads:

  FLAT — raw f32; SQ — int8 affine; PQ — codes + per-query ADC LUT.
"""

from __future__ import annotations

import io
import json
import time
from functools import partial

import numpy as np

from ..errors import InvalidInputError
from ..ops.distance import normalize_metric
from ..ops.pq import adc_lut, default_num_sub_vectors, pq_encode, pq_train
from ..storage.manifest import IndexMeta, new_uuid
from .vector import PAD_PENALTY, SearchParams, _load_npy, _save_npy, _collect_vectors

DEFAULT_M = 20  # reference index/vector.rs:402
DEFAULT_EF_CONSTRUCTION = 300  # reference index/vector.rs:415
DEFAULT_EF_SEARCH = 64

_KNN_QUERY_CHUNK = 1024  # rows of the kNN graph computed per device dispatch
_KNN_BLOCK = 8192  # database block per scan step (Q_CHUNK×B f32 = 32 MiB)


def _knn_graph(vectors: np.ndarray, k: int, metric: str, return_base: bool = False):
    """Exact self-excluded kNN ids ``(n, k)`` via blocked MXU matmuls.

    The base set lives on device once; queries stream through in chunks,
    each chunk scanning the base in ``_KNN_BLOCK`` tiles with a running
    k-best merge (O(Q·B) memory — ops/topk.py blocked_topk_scan).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.topk import blocked_topk_scan

    n, dim = vectors.shape
    k_eff = min(k, n - 1)
    base = vectors.astype(np.float32)
    if metric == "cosine":
        base = base / np.maximum(np.linalg.norm(base, axis=1, keepdims=True), 1e-30)
    block = min(_KNN_BLOCK, max(128, n))
    num_blocks = -(-n // block)
    pad_n = num_blocks * block
    xb = jnp.asarray(np.pad(base, ((0, pad_n - n), (0, 0))))
    xb_blocks = xb.reshape(num_blocks, block, dim)
    sq_blocks = (xb_blocks * xb_blocks).sum(-1)  # (num_blocks, block)
    valid = (jnp.arange(pad_n) < n).reshape(num_blocks, block)

    @jax.jit
    def chunk_topk(qc):
        def score_block(i):
            blk = xb_blocks[i]
            if metric == "dot":
                d = -(qc @ blk.T)
            else:  # l2 / cosine (cosine pre-normalized: same ordering)
                d = sq_blocks[i][None, :] - 2.0 * (qc @ blk.T)
            d = jnp.where(valid[i][None, :], d, jnp.inf)
            ids = i * block + jnp.arange(block, dtype=jnp.int64)
            return d, ids

        return blocked_topk_scan(score_block, num_blocks, k_eff + 1, qc.shape[0])

    q_chunk = min(_KNN_QUERY_CHUNK, n)
    out = np.empty((n, k_eff), dtype=np.int64)
    for start in range(0, n, q_chunk):
        stop = min(start + q_chunk, n)
        qs = base[start:stop]
        if len(qs) < q_chunk:  # keep shapes static: one compile per build
            qs = np.pad(qs, ((0, q_chunk - len(qs)), (0, 0)))
        _, ids = chunk_topk(jnp.asarray(qs))
        ids = np.asarray(ids[: stop - start])
        # drop self from each row (k_eff+1 fetched), keep k_eff
        rows = np.arange(start, stop)[:, None]
        keep = ids != rows
        # ties can leave self absent: drop the worst slot instead
        for r in np.flatnonzero(keep.sum(1) == k_eff + 1):
            keep[r, k_eff] = False
        out[start:stop] = ids[keep].reshape(stop - start, k_eff)
    if return_base:
        return out, xb  # device-resident (padded) base for follow-up passes
    return out


def _mask_self_and_dups(pool: np.ndarray, self_ids: np.ndarray) -> np.ndarray:
    """Replace self references and duplicate candidates with -1 (the
    prune kernel treats negatives as +inf-distance padding)."""
    order = np.argsort(pool, axis=1, kind="stable")
    svals = np.take_along_axis(pool, order, axis=1)
    dup_sorted = np.zeros_like(svals, dtype=bool)
    dup_sorted[:, 1:] = svals[:, 1:] == svals[:, :-1]
    dup = np.zeros_like(dup_sorted)
    np.put_along_axis(dup, order, dup_sorted, axis=1)
    mask = dup | (pool == self_ids[:, None])
    return np.where(mask, -1, pool)


def _rng_prune(xb, cand: np.ndarray, deg: int) -> np.ndarray:
    """Occlusion (RNG) pruning of kNN candidate edges, on device.

    Exact-kNN edges of a clustered corpus all point into the node's own
    blob — at 500k rows the layer-0 graph fragments into per-cluster
    islands and recall goes ef-INDEPENDENT (the misses are unreachable,
    not under-searched; measured 0.66 flat from ef=64 to 512). The fix
    is the classic HNSW/CAGRA neighbor-selection heuristic (Malkov &
    Yashunin Alg. 4; CAGRA's graph optimization): walk candidates in
    distance order and keep an edge only if the candidate is closer to
    the node than to every already-kept neighbor — forcing edges to
    span DIRECTIONS instead of crowding one blob. Pruned slots backfill
    with the nearest unkept candidates, so degree stays `deg`.

    The greedy dependency chain runs as a lax.scan over candidates with
    all pairwise distances on device — only the (n, deg) selected ids
    come back (the (n, kc²) distance tensor would be ~13 GB of tunnel
    traffic at 500k rows).

    xb: (n_pad, D) device-resident base (from _knn_graph); cand:
    (n, kc) HOST candidate ids sorted by distance. Returns (n, deg) ids.
    """
    import jax.numpy as jnp

    n, kc = cand.shape
    if kc <= deg:
        return cand[:, :deg]
    chunk = 4096
    out = np.empty((n, deg), dtype=cand.dtype)
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        node_ids = np.arange(start, stop)
        cids = cand[start:stop]
        if stop - start < chunk:  # static shapes: one compile
            pad = chunk - (stop - start)
            node_ids = np.pad(node_ids, (0, pad))
            cids = np.pad(cids, ((0, pad), (0, 0)))
        sel = np.asarray(
            _prune_chunk_device(xb, jnp.asarray(node_ids), jnp.asarray(cids), deg)
        )
        out[start:stop] = sel[: stop - start]
    # rows with fewer than deg real candidates can backfill a masked
    # (-1) slot: repeat the nearest neighbor instead (the adjacency
    # builder dedupes edges)
    neg = out < 0
    if neg.any():
        out = np.where(neg, cand[:, :1], out)
    return out


def _prune_chunk_device(xb, node_ids, cand_ids, deg: int):
    """One chunk of occlusion pruning on device (module-level so the jit
    cache survives across layers/builds — an inner closure recompiled
    per _rng_prune call, and each tunnel compile is a 2-500 s queue
    draw)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("deg",))
    def run(xb, node_ids, cand_ids, deg):
        kc = cand_ids.shape[1]
        u = jnp.take(xb, node_ids, axis=0)            # (c, D)
        pad = cand_ids < 0                            # masked self/dup slots
        cv = jnp.take(xb, jnp.maximum(cand_ids, 0), axis=0)          # (c, kc, D)
        d_uc = jnp.sum(jnp.square(u[:, None, :] - cv), axis=-1)      # (c, kc)
        d_uc = jnp.where(pad, jnp.inf, d_uc)
        # candidates must walk in distance order (2-hop pools arrive
        # unsorted; duplicates self-occlude via d_cc = 0)
        sort = jnp.argsort(d_uc, axis=1)
        cand_ids = jnp.take_along_axis(cand_ids, sort, axis=1)
        cv = jnp.take_along_axis(cv, sort[:, :, None], axis=1)
        d_uc = jnp.take_along_axis(d_uc, sort, axis=1)
        cn2 = jnp.sum(jnp.square(cv), axis=-1)                       # (c, kc)
        dots = jnp.einsum("cid,cjd->cij", cv, cv,
                          preferred_element_type=jnp.float32)
        d_cc = jnp.maximum(cn2[:, :, None] - 2.0 * dots + cn2[:, None, :], 0.0)

        def body(occl, j):
            ok = d_uc[:, j] <= occl[:, j]
            occl = jnp.minimum(
                occl, jnp.where(ok[:, None], d_cc[:, j, :], jnp.inf)
            )
            return occl, ok

        _, oks = jax.lax.scan(body, jnp.full((u.shape[0], kc), jnp.inf),
                              jnp.arange(kc))
        keep = oks.T                                   # (c, kc)
        # kept candidates first (in distance order), then unkept backfill
        key = jnp.where(keep, 0, kc) + jnp.arange(kc)[None, :]
        order = jnp.argsort(key, axis=1)[:, :deg]
        return jnp.take_along_axis(cand_ids, order, axis=1)

    return run(xb, node_ids, cand_ids, deg)


def _capped_reverse_edges(forward: np.ndarray, nodes: np.ndarray, cap: int):
    """Reverse-edge lists per node, at most ``cap`` each (CAGRA-style
    reverse-edge addition for reachability), as (src, dst) arrays."""
    src = np.repeat(nodes, forward.shape[1])
    dst = forward.ravel()
    order = np.argsort(dst, kind="stable")
    dst_s, src_s = dst[order], src[order]
    uniq, starts, counts = np.unique(dst_s, return_index=True, return_counts=True)
    rank = np.arange(len(dst_s)) - np.repeat(starts, counts)
    keep = rank < cap
    return dst_s[keep], src_s[keep]  # reversed: dst becomes the source


def _layer_adjacency(forward: np.ndarray, nodes: np.ndarray, n: int, cap_rev: int):
    """CSR (offsets, targets) over all n slots from forward kNN edges +
    degree-capped reverse edges, deduplicated."""
    src = np.repeat(nodes, forward.shape[1])
    dst = forward.ravel()
    rsrc, rdst = _capped_reverse_edges(forward, nodes, cap_rev)
    all_src = np.concatenate([src, rsrc])
    all_dst = np.concatenate([dst, rdst])
    key = all_src.astype(np.int64) * n + all_dst
    _, first = np.unique(key, return_index=True)
    first.sort()  # preserve forward-edge (distance-sorted) precedence
    all_src, all_dst = all_src[first], all_dst[first]
    order = np.argsort(all_src, kind="stable")
    all_src, all_dst = all_src[order], all_dst[order]
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.add.at(offsets, all_src + 1, 1)
    np.cumsum(offsets, out=offsets)
    return offsets, all_dst.astype(np.int32)


def _build_layers(vectors: np.ndarray, m: int, metric: str, seed: int = 0):
    """All HNSW layers from per-layer exact kNN graphs.

    Level assignment is the standard geometric draw (ml = 1/ln m); each
    layer's adjacency is the exact kNN graph among that layer's nodes —
    strictly better edges than an ef_construction-bounded beam search,
    computed on the MXU instead of by pointer chasing.
    """
    n = len(vectors)
    m0 = 2 * m
    rng = np.random.default_rng(seed)
    ml = 1.0 / np.log(m)
    levels = (-np.log(rng.uniform(1e-12, 1.0, size=n)) * ml).astype(np.int64)
    entry = int(np.argmax(levels))
    max_level = int(levels[entry])
    layers = []
    for lv in range(max_level + 1):
        nodes = np.flatnonzero(levels >= lv)
        deg = m0 if lv == 0 else m
        if len(nodes) < 2:
            layers.append((np.zeros(n + 1, dtype=np.int64), np.zeros(0, np.int32)))
            continue
        # 2x candidates, then occlusion-prune to deg for edge diversity
        kc = min(2 * deg, len(nodes) - 1)
        cand, xb_dev = _knn_graph(vectors[nodes], kc, metric, return_base=True)
        local = _rng_prune(xb_dev, cand, min(deg, kc))
        if len(nodes) > 4 * deg:
            # CAGRA-style 2-hop candidate expansion + re-prune: exact-kNN
            # pools are blob-local on clustered data, so neighbors-of-
            # neighbors widen the frontier before the diversity pruning
            # picks direction-spanning edges. The 2-hop pool contains the
            # node itself and duplicates — mask them (a self edge sorts
            # first at d=0 and would silently eat an out-degree slot).
            hop2 = local[local[:, : min(8, local.shape[1])]].reshape(len(nodes), -1)
            pool = np.concatenate([cand, hop2], axis=1)
            pool = _mask_self_and_dups(pool, np.arange(len(nodes)))
            local = _rng_prune(xb_dev, pool, min(deg, kc))
        del xb_dev
        forward = nodes[local]  # map layer-local ids back to global
        layers.append(_layer_adjacency(forward, nodes, n, cap_rev=deg))
    return layers, entry, levels


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
    """Build the graph + quantized storage; persist as CSR arrays.

    The graph edges come from per-layer exact kNN (``_build_layers``) —
    the batched device formulation of the reference's incremental build
    (lance HNSW, index/vector.rs:402-415). ef_construction is accepted
    for API parity but the exact-kNN edges already dominate any beam-
    search-bounded build quality, so it does not bound this build.
    """
    t0 = time.time()
    metric = normalize_metric(config.distance_type)
    kind = {"IVF_HNSW_FLAT": "FLAT", "IVF_HNSW_SQ": "SQ", "IVF_HNSW_PQ": "PQ"}[config.index_type]
    vectors, row_ids, frag_ids = _collect_vectors(dataset, column)
    storage = _Storage.build(kind, vectors, metric, config)
    n = storage.num_rows()
    # graph is built over the vectors the query-time walk will read, so
    # quantization error shapes the edges exactly as it shapes the walk
    if kind == "FLAT":
        graph_vecs = storage.vectors
    elif kind == "SQ":
        graph_vecs = storage.codes.astype(np.float32) * storage.scale + storage.offset
    else:
        graph_vecs = vectors.astype(np.float32)
    if metric == "cosine" and kind != "FLAT":
        graph_vecs = graph_vecs / np.maximum(
            np.linalg.norm(graph_vecs, axis=1, keepdims=True), 1e-30
        )
    layers, entry, _levels = _build_layers(
        graph_vecs, config.m, metric, seed=getattr(config, "seed", 0)
    )
    uuid = new_uuid()
    store = dataset.store
    prefix = dataset.index_dir(uuid)
    storage.save(store, prefix)
    _save_npy(store, f"{prefix}/row_ids.npy", row_ids.view(np.int64))
    for lv, (offsets, targets) in enumerate(layers):
        _save_npy(store, f"{prefix}/level{lv}_offsets.npy", offsets)
        _save_npy(store, f"{prefix}/level{lv}_targets.npy", targets)
    meta_doc = {
        "index_type": config.index_type,
        "column": column,
        "metric": metric,
        "dim": vectors.shape[1],
        "num_rows": n,
        "m": config.m,
        "ef_construction": config.ef_construction,
        "num_levels": len(layers),
        "entry": int(entry),
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
            for lv in range(len(self.levels) - 1, 1, -1):
                ep = self._greedy(dist_fn, ep, lv)
            if len(self.levels) > 1:
                # beam (not greedy) at the LAST upper layer: clustered
                # corpora punish single-entry descent — a wrong-basin
                # entry is unrecoverable at layer 0, so seed it with
                # several nearby basins instead of one
                seeds = [n for _, n in self._search_layer(dist_fn, [ep], 8, None, level=1)]
            else:
                seeds = [ep]
            res = self._search_layer(
                dist_fn, seeds or [ep],
                max(ef, k * 3 if blocked else ef), slot_penalty, level=0,
            )
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

    def _search_layer(self, dist_fn, eps: list[int], ef: int, penalty, level: int = 0):
        """Beam search over one layer from one or more entry points."""
        import heapq as hq

        eps = list(dict.fromkeys(int(e) for e in eps))
        d0s = dist_fn(np.asarray(eps))
        visited = set(eps)
        candidates = [(float(d), e) for d, e in zip(d0s, eps)]
        hq.heapify(candidates)
        results = [(-self._pen(float(d), e, penalty), e) for d, e in zip(d0s, eps)]
        hq.heapify(results)
        while len(results) > ef:
            hq.heappop(results)
        while candidates:
            d, node = hq.heappop(candidates)
            if d > -results[0][0] and len(results) >= ef:
                break
            neigh = [n for n in self._adj(level, node) if n not in visited]
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
