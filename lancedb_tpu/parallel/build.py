"""Distributed index building over a device mesh.

Config #5 scaffolding (BASELINE.md: "DEEP100M-scale sharded IVF_PQ
across TPU mesh"): when the table exceeds one chip's HBM, both the
build and the serve shard over the mesh.

Build pipeline:
  1. coarse centroids — data-parallel k-means (rows sharded, `psum`
     reductions; parallel/search.make_distributed_kmeans_step)
  2. assignment + residual PQ encode — embarrassingly parallel over
     row shards (each device encodes its rows with the replicated
     centroids/codebooks)
  3. partitioned layout — host-side scatter per shard; partitions are
     assigned to shards round-robin so each device owns a contiguous
     slice of the padded partition array (the layout
     make_sharded_ivf_search expects)

Serve: ShardedIvfPqIndex mirrors ShardedFlatIndex with the PQ scan.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.pq import default_num_sub_vectors, pq_encode, pq_reconstruct, pq_train
from ..ops.topk import topk_smallest
from ..ops.util import matmul_dtype, round_up
from .mesh import QUERY_AXIS, SHARD_AXIS
from .search import PAD, make_distributed_kmeans_step


def distributed_kmeans(
    mesh, data: np.ndarray, k: int, iters: int = 25, seed: int = 0
) -> np.ndarray:
    """Full distributed Lloyd: rows sharded over the mesh, centroids
    replicated, `psum` reductions per iteration."""
    rng = np.random.default_rng(seed)
    n_dev = mesh.devices.size
    n = len(data)
    pad = (-n) % n_dev
    if pad:
        data = np.concatenate([data, data[rng.integers(0, n, pad)]])
    step = make_distributed_kmeans_step(mesh, k=k)
    xj = jax.device_put(data, NamedSharding(mesh, P((QUERY_AXIS, SHARD_AXIS), None)))
    cents = jax.device_put(
        data[rng.choice(n, k, replace=False)].copy(), NamedSharding(mesh, P())
    )
    for _ in range(iters):
        cents, counts = step(xj, cents)
    return np.asarray(cents)


class ShardedIvfPqIndex:
    """Mesh-sharded IVF_PQ: partitions sharded, centroids + codebooks
    replicated; the scan is the same residual-ADC formulation as the
    single-chip kernel, with per-device ownership masking and an
    all_gather top-k merge."""

    def __init__(
        self,
        mesh,
        vectors: np.ndarray,
        row_ids: np.ndarray,
        num_partitions: int,
        num_sub_vectors: int | None = None,
        metric: str = "l2",
        kmeans_iters: int = 25,
        seed: int = 0,
    ):
        self.mesh = mesh
        self.metric = metric
        n, dim = vectors.shape
        nsub = num_sub_vectors or default_num_sub_vectors(dim)
        shard_n = mesh.shape[SHARD_AXIS]
        # partitions must divide evenly across shards
        num_partitions = round_up(num_partitions, shard_n)

        # 1. distributed coarse k-means
        centroids = distributed_kmeans(mesh, vectors, num_partitions, kmeans_iters, seed)
        # 2. assignment + residual PQ (host-orchestrated, device compute)
        from ..ops.kmeans import kmeans_assign

        assign = kmeans_assign(vectors, centroids, metric="l2")
        residuals = vectors - centroids[assign]
        codebooks = pq_train(residuals, nsub, seed=seed)
        codes = pq_encode(residuals, codebooks)
        recon = pq_reconstruct(codes, codebooks) + centroids[assign]
        rnorms_flat = np.sum(recon.astype(np.float64) ** 2, axis=1).astype(np.float32)
        # 3. padded partition layout
        order = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=num_partitions)
        pmax = int(round_up(max(1, counts.max()), 8))
        codes_p = np.zeros((num_partitions, pmax, nsub), dtype=np.uint8)
        rn_p = np.full((num_partitions, pmax), np.float32(3.0e38))
        rid_p = np.full((num_partitions, pmax), -1, dtype=np.int64)
        start = 0
        sorted_codes = codes[order]
        sorted_rn = rnorms_flat[order]
        sorted_rid = row_ids[order].view(np.int64)
        for pid in range(num_partitions):
            c = counts[pid]
            if c:
                codes_p[pid, :c] = sorted_codes[start : start + c]
                rn_p[pid, :c] = sorted_rn[start : start + c]
                rid_p[pid, :c] = sorted_rid[start : start + c]
            start += c
        self.row_ids = rid_p.reshape(-1).view(np.uint64)
        self.pmax = pmax
        self.nparts = num_partitions
        shard3 = NamedSharding(mesh, P(SHARD_AXIS, None, None))
        shard2 = NamedSharding(mesh, P(SHARD_AXIS, None))
        repl = NamedSharding(mesh, P())
        self._centroids = jax.device_put(centroids, repl)
        self._codebooks = jax.device_put(codebooks.astype(np.float32), repl)
        self._codes = jax.device_put(codes_p, shard3)
        self._rnorms = jax.device_put(rn_p, shard2)
        self._slots = jax.device_put(
            np.arange(num_partitions * pmax, dtype=np.int32).reshape(num_partitions, pmax),
            shard2,
        )
        self._steps: dict[tuple[int, int], callable] = {}

    def _make_step(self, k: int, nprobes: int):
        mesh = self.mesh
        nsub = self._codebooks.shape[0]
        dsub = self._codebooks.shape[2]
        kcode = self._codebooks.shape[1]
        pmax = self.pmax

        def step(q, centroids, codebooks, codes, rnorms, slots):
            def local(q_blk, cents, cbs, codes_loc, rn_loc, slot_loc):
                p_loc = codes_loc.shape[0]
                my_shard = jax.lax.axis_index(SHARD_AXIS)
                qf = q_blk.astype(jnp.float32)
                dots = jnp.dot(
                    qf.astype(matmul_dtype()), cents.astype(matmul_dtype()).T,
                    preferred_element_type=jnp.float32,
                )
                cn2 = jnp.sum(jnp.square(cents), axis=-1)
                cd = jnp.sum(jnp.square(qf), -1, keepdims=True) - 2.0 * dots + cn2[None, :]
                _, probe_ids = topk_smallest(cd, nprobes)
                probe_dots = jnp.take_along_axis(dots, probe_ids, axis=1)
                owner = probe_ids // p_loc
                local_ids = jnp.where(owner == jax.lax.axis_index(SHARD_AXIS), probe_ids % p_loc, 0)
                mine = owner == my_shard
                qs = qf.reshape(qf.shape[0], nsub, dsub)
                dlut = jnp.einsum(
                    "qsd,skd->qsk", qs.astype(matmul_dtype()), cbs.astype(matmul_dtype()),
                    preferred_element_type=jnp.float32,
                ).astype(matmul_dtype())
                qn2 = jnp.sum(jnp.square(qf), axis=-1)

                def probe_step(j):
                    pid = local_ids[:, j]
                    codes_j = jnp.take(codes_loc, pid, axis=0)
                    rn_j = jnp.take(rn_loc, pid, axis=0)
                    slot_j = jnp.take(slot_loc, pid, axis=0)
                    oh = jax.nn.one_hot(codes_j.astype(jnp.int32), kcode, dtype=matmul_dtype())
                    qdotr = jnp.einsum("qpsk,qsk->qp", oh, dlut, preferred_element_type=jnp.float32)
                    d = qn2[:, None] - 2.0 * (probe_dots[:, j][:, None] + qdotr) + rn_j
                    d = jnp.where(mine[:, j][:, None], d, PAD)
                    vals, off = topk_smallest(d, min(k, pmax))
                    return vals, jnp.take_along_axis(slot_j, off, axis=1)

                from ..ops.topk import merge_topk

                def body(carry, j):
                    bv, bs = carry
                    v, s = probe_step(j)
                    if v.shape[1] < k:
                        pad = k - v.shape[1]
                        v = jnp.pad(v, ((0, 0), (0, pad)), constant_values=PAD)
                        s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=0)
                    return merge_topk(bv, bs, v, s, k), None

                init = (
                    jnp.full((q_blk.shape[0], k), PAD, jnp.float32),
                    jnp.zeros((q_blk.shape[0], k), jnp.int32),
                )
                (vals, slots_out), _ = jax.lax.scan(body, init, jnp.arange(nprobes))
                all_v = jax.lax.all_gather(vals, SHARD_AXIS, axis=1, tiled=True)
                all_s = jax.lax.all_gather(slots_out, SHARD_AXIS, axis=1, tiled=True)
                mv, mp = topk_smallest(all_v, k)
                return mv, jnp.take_along_axis(all_s, mp, axis=1)

            return jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(
                    P(QUERY_AXIS), P(), P(),
                    P(SHARD_AXIS, None, None), P(SHARD_AXIS, None), P(SHARD_AXIS, None),
                ),
                out_specs=(P(QUERY_AXIS), P(QUERY_AXIS)),
                check_vma=False,
            )(q, centroids, codebooks, codes, rnorms, slots)

        return jax.jit(step)

    def search(self, queries: np.ndarray, k: int, nprobes: int = 20):
        q = np.atleast_2d(np.asarray(queries, np.float32))
        nq = q.shape[0]
        qpar = self.mesh.shape[QUERY_AXIS]
        pad_q = (-nq) % max(qpar, 1)
        if pad_q:
            q = np.pad(q, ((0, pad_q), (0, 0)))
        key = (k, nprobes)
        if key not in self._steps:
            self._steps[key] = self._make_step(k, nprobes)
        qj = jax.device_put(q, NamedSharding(self.mesh, P(QUERY_AXIS, None)))
        vals, slots = self._steps[key](
            qj, self._centroids, self._codebooks, self._codes, self._rnorms, self._slots
        )
        vals = np.asarray(vals)[:nq]
        slots = np.asarray(slots)[:nq]
        rids = self.row_ids[slots]
        invalid = vals >= np.float32(3.0e38) / 2
        rids = np.where(invalid, np.uint64(np.iinfo(np.uint64).max), rids)
        return np.where(invalid, np.inf, vals), rids
