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
drives (`search`/`slot_penalty`/`refine`/`metric`). Prefiltered and
deletion-masked queries fan out too: the per-slot penalty lives in the
same block layout the shards were dealt from, so each shard adds its
slice of the penalty into the residual norms before the ADC scan
(parallel/build.py search(slot_penalty=...)). Refine reranks on the
host via the dataset gather — it touches k·refine rows, not the
corpus — without ever loading the single-device index.
"""

from __future__ import annotations

import numpy as np

from ..errors import InvalidInputError


class ShardedServingSearcher:
    """Mesh-sharded drop-in for VectorSearcher (index/vector.py)."""

    def __init__(self, sharded, fallback_loader, metric, params, index_type):
        self._sharded = sharded
        # retained as a seam for index types the sharded kernel cannot
        # serve; the IVF_PQ l2/cosine paths never load it
        self._fallback_loader = fallback_loader
        self.metric = metric
        self.params = params
        self.index_type = index_type

    # -- interface driven by execute_vector_query ------------------------
    def slot_penalty(self, allowed_row_ids, deleted_row_ids, vanished_fragments=None):
        return self._sharded.slot_penalty(
            allowed_row_ids, deleted_row_ids, vanished_fragments=vanished_fragments
        )

    def search(self, queries, params, slot_penalty=None):
        # refine reranks k_eff candidates, mirroring the single-device
        # searcher (index/vector.py k_eff expansion)
        k_eff = params.k if params.refine_factor is None else params.k * params.refine_factor
        return self._sharded.search(
            np.asarray(queries, np.float32), k=k_eff, nprobes=params.nprobes,
            slot_penalty=slot_penalty,
        )

    def refine(self, dataset, column, queries, dists, row_ids, k):
        from ..index.vector import refine_candidates

        return refine_candidates(dataset, column, queries, row_ids, k, self.metric)


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
    if metric not in ("l2", "cosine"):
        # the sharded ADC kernel computes l2 expansions; on the unit
        # sphere that also yields cosine — dot needs the single-device
        # reporting path
        raise InvalidInputError(
            f"sharded serving supports l2/cosine metrics (index is {metric})"
        )
    sharded = ShardedIvfPqIndex.from_dataset(mesh, dataset, index_meta)
    return ShardedServingSearcher(
        sharded, fallback_loader, metric=metric,
        params=dict(index_meta.params), index_type=index_meta.index_type,
    )
