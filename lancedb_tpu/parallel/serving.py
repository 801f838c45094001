"""Serve a table's IVF_PQ index across a device mesh — transparently.

The reference's distributed query execution happens server-side in
LanceDB Cloud (SURVEY.md §2.6 "Distributed query"); the TPU-native
equivalent shards the persisted index over a `jax.sharding.Mesh`
(parallel/build.py ShardedIvfPqIndex: partitions sharded, per-device
top-k, `all_gather` merge over ICI) and plugs into the SAME query
pipeline the single-chip searcher uses:

    tbl.enable_sharded_serving(mesh)   # once
    tbl.search(q).nprobes(20).to_arrow()   # now fans out over the mesh

The adapter implements the searcher interface execute_vector_query
drives (`search`/`slot_penalty`/`refine`/`metric`). Prefiltered or
deletion-masked queries fall back to the single-device searcher —
penalty vectors are laid out per-chip differently, and filtered
serving is latency- not throughput-bound. Refine reranks on one chip
(it touches k·refine rows, not the corpus).
"""

from __future__ import annotations

import numpy as np

from ..errors import InvalidInputError


class ShardedServingSearcher:
    """Mesh-sharded drop-in for VectorSearcher (index/vector.py).

    The single-device searcher loads LAZILY, on the first query that
    needs it (filters/deletions/refine) — pure unfiltered serving never
    double-loads the index."""

    def __init__(self, sharded, fallback_loader, metric, params, index_type):
        self._sharded = sharded
        self._fallback_loader = fallback_loader
        self._fallback_cached = None
        self.metric = metric
        self.params = params
        self.index_type = index_type

    @property
    def _fallback(self):
        if self._fallback_cached is None:
            self._fallback_cached = self._fallback_loader()
        return self._fallback_cached

    # -- interface driven by execute_vector_query ------------------------
    def slot_penalty(self, allowed_row_ids, deleted_row_ids, vanished_fragments=None):
        if allowed_row_ids is None and deleted_row_ids is None and not vanished_fragments:
            return None
        return self._fallback.slot_penalty(
            allowed_row_ids, deleted_row_ids, vanished_fragments=vanished_fragments
        )

    def search(self, queries, params, slot_penalty=None):
        if slot_penalty is not None:
            # filters/deletions: single-device path understands the
            # per-slot penalty layout
            return self._fallback.search(queries, params, slot_penalty=slot_penalty)
        # refine reranks k_eff candidates, mirroring the single-device
        # searcher (index/vector.py k_eff expansion)
        k_eff = params.k if params.refine_factor is None else params.k * params.refine_factor
        return self._sharded.search(
            np.asarray(queries, np.float32), k=k_eff, nprobes=params.nprobes
        )

    def refine(self, dataset, column, queries, dists, row_ids, k):
        return self._fallback.refine(dataset, column, queries, dists, row_ids, k)


def make_sharded_searcher(mesh, dataset, index_meta, fallback_loader):
    """Build the serving adapter for one persisted IVF_PQ index.
    Raises InvalidInputError for index/metric combinations the sharded
    kernel does not serve (callers fall back to single-device)."""
    from .build import ShardedIvfPqIndex

    if index_meta.index_type != "IVF_PQ":
        raise InvalidInputError(
            f"sharded serving supports IVF_PQ indexes (got {index_meta.index_type})"
        )
    metric = index_meta.params.get("metric", "l2")
    if metric != "l2":
        # the sharded ADC kernel computes l2 expansions; cosine/dot
        # need the single-device normalization/reporting path
        raise InvalidInputError(
            f"sharded serving currently supports the l2 metric (index is {metric})"
        )
    sharded = ShardedIvfPqIndex.from_dataset(mesh, dataset, index_meta)
    return ShardedServingSearcher(
        sharded, fallback_loader, metric=metric,
        params=dict(index_meta.params), index_type=index_meta.index_type,
    )
