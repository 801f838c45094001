"""Distributed search + index training over a device mesh.

This is the §2.6/§2.7 re-expression: the reference's "distributed query
execution" (Cloud server side) and IVF-partition parallelism become
`jax.shard_map` programs — database rows (or IVF partitions) sharded
over the `shard` mesh axis, queries optionally sharded over the
`query` axis, per-device top-k merged with `all_gather` riding ICI.

Programs:

* sharded_flat_search   — 2D-sharded brute-force scan: each device
  scores its (query-block × row-shard) tile, local top-k, all_gather
  along `shard`, merge. Wall-clock = one tile scan + one k-row gather.
* sharded_ivf_search    — centroids replicated, padded partitions
  sharded; global probe selection, devices scan only probes they own
  (non-owned probes masked), merge as above.
* distributed_kmeans_step — Lloyd iteration with rows sharded:
  local assign + local one-hot partial sums, `psum` over `shard` —
  the classic data-parallel training step (our dryrun "training step").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.topk import topk_smallest
from ..ops.util import matmul_dtype
from .mesh import QUERY_AXIS, SHARD_AXIS

PAD = jnp.float32(3.0e38)


def _local_flat_scores(q, x, norms2, metric: str):
    qf = q.astype(jnp.float32)
    dots = jnp.dot(
        qf.astype(matmul_dtype()), x.astype(matmul_dtype()).T,
        preferred_element_type=jnp.float32,
    )
    if metric == "dot":
        return -dots
    if metric == "cosine":
        qn = jnp.sqrt(jnp.sum(jnp.square(qf), axis=-1, keepdims=True))
        return 1.0 - dots / jnp.maximum(qn, 1e-30)
    qn2 = jnp.sum(jnp.square(qf), axis=-1, keepdims=True)
    return qn2 - 2.0 * dots + norms2[None, :]


def make_sharded_flat_search(mesh, k: int, metric: str = "l2"):
    """Compile a sharded brute-force search step.

    Inputs (global shapes):
      q        (Q, D)  sharded over QUERY_AXIS on dim 0
      x        (N, D)  sharded over SHARD_AXIS on dim 0
      norms2   (N,)    sharded like x (+PAD on padding rows)
      rowids   (N,)    int32 global slot ids, sharded like x
    Output: (Q, k) distances + (Q, k) global ids, sharded over QUERY_AXIS.
    """

    def step(q, x, norms2, rowids):
        def local(q_blk, x_loc, n2_loc, rid_loc):
            d = _local_flat_scores(q_blk, x_loc, n2_loc, metric)
            vals, idx = topk_smallest(d, min(k, d.shape[1]))
            ids = rid_loc[idx]
            if vals.shape[1] < k:
                pad = k - vals.shape[1]
                vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=PAD)
                ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
            # gather candidates from every shard: (Q_blk, ndev*k)
            all_vals = jax.lax.all_gather(vals, SHARD_AXIS, axis=1, tiled=True)
            all_ids = jax.lax.all_gather(ids, SHARD_AXIS, axis=1, tiled=True)
            m_vals, pos = topk_smallest(all_vals, k)
            m_ids = jnp.take_along_axis(all_ids, pos, axis=1)
            return m_vals, m_ids

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(QUERY_AXIS), P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
            out_specs=(P(QUERY_AXIS), P(QUERY_AXIS)),
            check_vma=False,
        )(q, x, norms2, rowids)

    return jax.jit(step)


def make_sharded_ivf_search(mesh, k: int, nprobes: int, metric: str = "l2"):
    """Compile a sharded IVF_FLAT search step.

    Inputs (global shapes; P = num partitions, sharded over SHARD_AXIS):
      q          (Q, D)   sharded over QUERY_AXIS
      centroids  (P, D)   REPLICATED
      parts      (P, pmax, D) sharded on dim 0
      norms2     (P, pmax)    sharded on dim 0 (+PAD padding)
      rowids     (P, pmax)    int32 global ids, sharded on dim 0
    """

    def step(q, centroids, parts, norms2, rowids):
        nparts = centroids.shape[0]

        def local(q_blk, cents, parts_loc, n2_loc, rid_loc):
            p_loc = parts_loc.shape[0]
            my_shard = jax.lax.axis_index(SHARD_AXIS)
            # global probe selection on replicated centroids
            qf = q_blk.astype(jnp.float32)
            dots = jnp.dot(
                qf.astype(matmul_dtype()), cents.astype(matmul_dtype()).T,
                preferred_element_type=jnp.float32,
            )
            cn2 = jnp.sum(jnp.square(cents), axis=-1)
            cd = jnp.sum(jnp.square(qf), -1, keepdims=True) - 2.0 * dots + cn2[None, :]
            _, probe_ids = topk_smallest(cd, nprobes)  # (Qb, nprobes) global
            # ownership: partition p lives on shard p // p_loc at local p % p_loc
            owner = probe_ids // p_loc
            local_ids = probe_ids % p_loc
            mine = owner == my_shard
            safe_ids = jnp.where(mine, local_ids, 0)
            g_vecs = jnp.take(parts_loc, safe_ids, axis=0)  # (Qb, np, pmax, D)
            g_n2 = jnp.take(n2_loc, safe_ids, axis=0)
            g_rid = jnp.take(rid_loc, safe_ids, axis=0)
            dots_p = jnp.einsum(
                "qnpd,qd->qnp",
                g_vecs.astype(matmul_dtype()),
                qf.astype(matmul_dtype()),
                preferred_element_type=jnp.float32,
            )
            if metric == "dot":
                d = -dots_p + jnp.where(g_n2 >= PAD, PAD, 0.0)
            elif metric == "cosine":
                qn = jnp.sqrt(jnp.sum(jnp.square(qf), -1))[:, None, None]
                d = 1.0 - dots_p / jnp.maximum(qn, 1e-30)
                d = d + jnp.where(g_n2 >= PAD, PAD, 0.0)
            else:
                qn2 = jnp.sum(jnp.square(qf), -1)[:, None, None]
                d = qn2 - 2.0 * dots_p + g_n2
            d = jnp.where(mine[:, :, None], d, PAD)  # mask probes we don't own
            qb = q_blk.shape[0]
            d = d.reshape(qb, -1)
            ids = g_rid.reshape(qb, -1)
            vals, pos = topk_smallest(d, k)
            sel = jnp.take_along_axis(ids, pos, axis=1)
            all_vals = jax.lax.all_gather(vals, SHARD_AXIS, axis=1, tiled=True)
            all_ids = jax.lax.all_gather(sel, SHARD_AXIS, axis=1, tiled=True)
            m_vals, mpos = topk_smallest(all_vals, k)
            return m_vals, jnp.take_along_axis(all_ids, mpos, axis=1)

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(QUERY_AXIS), P(), P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS)),
            out_specs=(P(QUERY_AXIS), P(QUERY_AXIS)),
            check_vma=False,
        )(q, centroids, parts, norms2, rowids)

    return jax.jit(step)


def make_distributed_kmeans_step(mesh, k: int, metric: str = "l2"):
    """Compile one data-parallel Lloyd iteration (the training step).

    x (N, D) sharded over SHARD_AXIS; centroids (K, D) replicated.
    Returns updated replicated centroids + global counts. `psum` over the
    shard axis does the cross-device reduction (ICI collective).
    """

    def step(x, centroids):
        def local(x_loc, cents):
            xf = x_loc.astype(jnp.float32)
            xb = xf.astype(matmul_dtype())
            dots = jnp.dot(xb, cents.astype(matmul_dtype()).T, preferred_element_type=jnp.float32)
            cn2 = jnp.sum(jnp.square(cents), axis=-1)
            xn2 = jnp.sum(jnp.square(xf), axis=-1)
            assign = jnp.argmin(xn2[:, None] - 2.0 * dots + cn2[None, :], axis=-1)
            onehot = jax.nn.one_hot(assign, k, dtype=matmul_dtype())
            sums = jnp.dot(onehot.T, xb, preferred_element_type=jnp.float32)
            counts = jnp.sum(onehot.astype(jnp.float32), axis=0)
            g_sums = jax.lax.psum(sums, SHARD_AXIS)
            g_counts = jax.lax.psum(counts, SHARD_AXIS)
            if mesh.shape.get(QUERY_AXIS, 1) > 1:
                g_sums = jax.lax.psum(g_sums, QUERY_AXIS)
                g_counts = jax.lax.psum(g_counts, QUERY_AXIS)
            new = g_sums / jnp.maximum(g_counts[:, None], 1.0)
            new = jnp.where((g_counts > 0)[:, None], new, cents)
            return new, g_counts

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P((QUERY_AXIS, SHARD_AXIS)), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(x, centroids)

    return jax.jit(step)


class ShardedFlatIndex:
    """Host wrapper: upload vectors sharded over a mesh, serve batches.

    This is config #5 scaffolding — DEEP100M-style sharding where one
    chip's HBM can't hold the table (SURVEY.md §6 target 5).
    """

    def __init__(self, mesh, vectors: np.ndarray, row_ids: np.ndarray, metric: str = "l2"):
        from .mesh import pad_to_multiple

        self.mesh = mesh
        self.metric = metric
        n_shards = mesh.shape[SHARD_AXIS] * mesh.shape.get(QUERY_AXIS, 1)
        vecs, n_real = pad_to_multiple(vectors.astype(np.float32), n_shards, axis=0)
        norms2 = np.sum(vecs.astype(np.float64) ** 2, axis=1).astype(np.float32)
        norms2[n_real:] = np.float32(3.0e38)
        ids = np.arange(len(vecs), dtype=np.int32)
        self.row_ids = row_ids
        self.n_real = n_real
        shard_spec = NamedSharding(mesh, P(SHARD_AXIS))
        self.x = jax.device_put(vecs, NamedSharding(mesh, P(SHARD_AXIS, None)))
        self.norms2 = jax.device_put(norms2, shard_spec)
        self.slot_ids = jax.device_put(ids, shard_spec)
        self._steps: dict[int, callable] = {}

    def search(self, queries: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        q = np.atleast_2d(np.asarray(queries, np.float32))
        nq = q.shape[0]
        qpar = self.mesh.shape[QUERY_AXIS]
        pad_q = (-nq) % max(qpar, 1)
        if pad_q:
            q = np.pad(q, ((0, pad_q), (0, 0)))
        if k not in self._steps:
            self._steps[k] = make_sharded_flat_search(self.mesh, k, self.metric)
        qj = jax.device_put(q, NamedSharding(self.mesh, P(QUERY_AXIS, None)))
        vals, slots = self._steps[k](qj, self.x, self.norms2, self.slot_ids)
        vals, slots = jax.device_get((vals, slots))  # one fused fetch
        vals = vals[:nq]
        slots = slots[:nq]
        ids = np.where(
            (slots >= 0) & (slots < self.n_real) & np.isfinite(vals),
            self.row_ids[np.clip(slots, 0, self.n_real - 1)],
            np.uint64(np.iinfo(np.uint64).max),
        )
        return vals, ids
