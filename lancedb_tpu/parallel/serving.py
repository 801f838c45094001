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
        refine_k = params.k if self.will_fuse_refine(params) else None
        return self._sharded.search(
            np.asarray(queries, np.float32), k=k_eff, nprobes=params.nprobes,
            slot_penalty=slot_penalty, refine_k=refine_k,
        )

    # -- fused per-shard refine (mirrors VectorSearcher) ------------------
    @property
    def device_refine_active(self) -> bool:
        return self._sharded.refine_attached

    def will_fuse_refine(self, params) -> bool:
        """Mirror of VectorSearcher.will_fuse_refine: precision='float32'
        requests never silently rerank against a lower-precision table."""
        if params.refine_factor is None or not self.device_refine_active:
            return False
        import jax.numpy as jnp

        return (
            getattr(params, "precision", "default") != "float32"
            or self._sharded._refine_vecs.dtype == jnp.float32
        )

    def prepare_device_refine(
        self, dataset, column: str, precision: str | None = None
    ) -> bool:
        """Shard a resident copy of the column over the mesh so
        search(refine_factor=rf) reranks per shard before the all_gather
        merge (parallel/build.py attach_refine_table). Same guards as
        the single-device path; the budget scales with the mesh (each
        shard holds 1/ndev of the table)."""
        import os

        if self.device_refine_active:
            return True
        if getattr(self, "_refine_unavailable", False):
            return False  # memoized: no per-query column rescan
        if os.environ.get("LANCEDB_TPU_DEVICE_REFINE", "1") == "0":
            return False
        sh = self._sharded
        import jax.numpy as jnp

        from ..index.vector import VectorSearcher
        from ..ops.util import matmul_dtype
        from .mesh import SHARD_AXIS

        dtype = jnp.float32 if precision == "float32" else matmul_dtype()
        bytes_per = 4 if dtype == jnp.float32 else 2
        shard_n = sh.mesh.shape[SHARD_AXIS]
        budget = float(os.environ.get("LANCEDB_TPU_DEVICE_REFINE_BUDGET", 6e9))
        # precheck on index geometry BEFORE materializing the column
        dim = int(sh._centroids.shape[1])
        if sh.num_slots * dim * bytes_per > budget * max(1, shard_n):
            self._refine_unavailable = True
            return False
        mat, pos, found = VectorSearcher.refine_column_slots(
            dataset, column, self.metric, sh.row_ids
        )
        if mat.shape[0] == 0:
            self._refine_unavailable = True
            return False
        vecs_slot = np.where(found[:, None], mat[pos], 0.0).astype(np.float32)
        norms2 = np.sum(vecs_slot.astype(np.float64) ** 2, axis=1).astype(np.float32)
        sh.attach_refine_table(vecs_slot, norms2, dtype=dtype)
        return True

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
