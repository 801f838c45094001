"""Distributed index building over a device mesh.

Config #5 scaffolding (BASELINE.md: "DEEP100M-scale sharded IVF_PQ
across TPU mesh"): when the table exceeds one chip's HBM, both the
build and the serve shard over the mesh.

Build pipeline:
  1. coarse centroids — data-parallel k-means (rows sharded, `psum`
     reductions; parallel/search.make_distributed_kmeans_step)
  2. assignment + residual PQ encode — device-resident single-program
     stages (ops.kmeans.assign_residuals_device, ops.pq.pq_encode_rnorms);
     at true multi-host scale each host runs them over its row shard
  3. balanced padded layout — oversized partitions split into
     duplicate-centroid blocks (index.vector._balanced_layout), blocks
     padded to a shard multiple with never-probed dummy blocks, and
     dealt round-robin so each device owns an equal contiguous slice

Serve (ShardedIvfPqIndex.search): probe selection is replicated, then
each shard COMPACTS the probe list to the probes it owns (sort-by-
ownership + a static per-shard budget ≈ 2·nprobes/shards) so per-shard
scan work actually scales with the mesh instead of being masked out;
local top-k results merge via all_gather. The scan itself is the same
residual-ADC formulation as the single-chip path — the fused Pallas
kernel on TPU, the XLA one-hot fallback elsewhere.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..index.vector import _balanced_layout, _pallas_available, _scatter_padded
from ..ops.kmeans import assign_residuals_device
from ..ops.pallas_adc import PMAX_ALIGN, S_ALIGN, ivf_pq_adc_scan_pallas
from ..ops.pq import default_num_sub_vectors, pq_encode_rnorms, pq_train
from ..ops.topk import topk_smallest
from ..ops.util import matmul_dtype, round_up
from .mesh import QUERY_AXIS, SHARD_AXIS
from .search import PAD, make_distributed_kmeans_step

# centroid magnitude for never-probed dummy blocks (|c|² ≈ 1e30 keeps
# the padded block out of every probe list without overflowing f32)
_DUMMY_CENTROID = np.float32(1.0e15)


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
    """Mesh-sharded IVF_PQ: blocks sharded, centroids + codebooks
    replicated; per-shard compacted-probe ADC scan + all_gather merge."""

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
        num_bits: int = 8,
    ):
        self.mesh = mesh
        self.metric = metric
        n, dim = vectors.shape
        nsub = num_sub_vectors or default_num_sub_vectors(dim)
        shard_n = mesh.shape[SHARD_AXIS]

        # 1. distributed coarse k-means
        centroids = distributed_kmeans(mesh, vectors, num_partitions, kmeans_iters, seed)
        # 2. assignment + residuals + PQ, all device-resident
        xd = jnp.asarray(vectors)
        cents_d = jnp.asarray(centroids)
        chunk = min(1 << 17, int(round_up(n, 8)))
        n_pad = ((n + chunk - 1) // chunk) * chunk
        xd_pad = jnp.pad(xd, ((0, n_pad - n), (0, 0))) if n_pad != n else xd
        assign_d, residuals_d = assign_residuals_device(
            xd_pad, cents_d, metric="l2", chunk=chunk, with_residuals=True
        )
        assign = np.asarray(assign_d[:n])
        res_d = residuals_d[:n]
        train_rows = min(n, 256 * 256)
        rng = np.random.default_rng(seed + 1)
        sel = rng.choice(n, train_rows, replace=False) if train_rows < n else np.arange(n)
        codebooks = pq_train(np.asarray(res_d[jnp.asarray(sel)]), nsub, num_bits=num_bits, seed=seed)
        codes, rnorms_flat = pq_encode_rnorms(res_d, cents_d, assign_d[:n], codebooks)

        # 3. balanced layout, padded to a shard multiple with dummy blocks
        order, block_cents, counts, pmax = _balanced_layout(
            assign, centroids, pad_multiple=PMAX_ALIGN
        )
        codes_p = _scatter_padded(codes, order, counts, pmax)  # (B, pmax, S)
        rn_p = _scatter_padded(rnorms_flat, order, counts, pmax, fill=np.float32(PAD))
        rid_p = _scatter_padded(row_ids.view(np.int64), order, counts, pmax, fill=-1)
        # kernel layout: subvectors on sublanes, slots on lanes
        s_pad = int(round_up(nsub, S_ALIGN))
        codes_psp = np.ascontiguousarray(codes_p.transpose(0, 2, 1))
        if s_pad != nsub:
            codes_psp = np.pad(codes_psp, ((0, 0), (0, s_pad - nsub), (0, 0)))
        self._place(codes_psp, rn_p, rid_p, block_cents, codebooks, pmax, num_partitions)

    @classmethod
    def from_dataset(cls, mesh, dataset, index_meta) -> "ShardedIvfPqIndex":
        """Serve a PERSISTED single-chip IVF_PQ index across the mesh:
        load the balanced-block artifacts build_vector_index wrote
        (index/vector.py — codes (P,S_pad,pmax), rnorms, centroids,
        row_ids) and shard them round-robin. Build once, serve on N
        chips; no retraining."""
        from ..index.vector import _load_npy

        if index_meta.index_type != "IVF_PQ":
            raise ValueError(f"from_dataset serves IVF_PQ; got {index_meta.index_type}")
        store = dataset.store
        prefix = dataset.index_dir(index_meta.uuid)
        self = cls.__new__(cls)
        self.mesh = mesh
        self.metric = index_meta.params["metric"]
        codes_psp = np.asarray(_load_npy(store, f"{prefix}/codes.npy"))
        rn_p = np.asarray(_load_npy(store, f"{prefix}/rnorms.npy"))
        rid_p = np.asarray(_load_npy(store, f"{prefix}/row_ids.npy"))
        block_cents = np.asarray(_load_npy(store, f"{prefix}/centroids.npy"))
        codebooks = np.asarray(_load_npy(store, f"{prefix}/codebooks.npy"))
        rotation = (
            np.asarray(_load_npy(store, f"{prefix}/rotation.npy"))
            if index_meta.params.get("opq")
            else None
        )
        self._place(
            codes_psp, rn_p, rid_p, block_cents, codebooks,
            index_meta.params["pmax"],
            index_meta.params.get("num_logical_partitions", codes_psp.shape[0]),
            rotation=rotation,
        )
        return self

    def _place(self, codes_psp, rn_p, rid_p, block_cents, codebooks, pmax, num_logical,
               rotation=None):
        """Shard-pad + round-robin deal + device placement."""
        mesh = self.mesh
        shard_n = mesh.shape[SHARD_AXIS]
        nblocks = codes_psp.shape[0]
        dim = block_cents.shape[1]
        pad_blocks = (-nblocks) % shard_n
        if pad_blocks:
            codes_psp = np.pad(codes_psp, ((0, pad_blocks), (0, 0), (0, 0)))
            rn_p = np.pad(rn_p, ((0, pad_blocks), (0, 0)), constant_values=np.float32(PAD))
            rid_p = np.pad(rid_p, ((0, pad_blocks), (0, 0)), constant_values=-1)
            block_cents = np.concatenate(
                [block_cents, np.full((pad_blocks, dim), _DUMMY_CENTROID, np.float32)]
            )
            nblocks += pad_blocks

        self.row_ids = np.ascontiguousarray(rid_p).reshape(-1).view(np.uint64)
        self.pmax = pmax
        self.nblocks = nblocks
        self.num_logical_partitions = num_logical
        # deal blocks round-robin: block b goes to shard b % shard_n at
        # local position b // shard_n — spreads centroid-space neighbors
        # (which queries probe together) across the mesh for load balance.
        # row_ids stay in ORIGINAL block order: global slot = b·pmax+off.
        deal = np.concatenate([np.arange(s, nblocks, shard_n) for s in range(shard_n)])
        self._deal = deal
        self.num_slots = nblocks * pmax
        shard3 = NamedSharding(mesh, P(SHARD_AXIS, None, None))
        shard2 = NamedSharding(mesh, P(SHARD_AXIS, None))
        self._shard2 = shard2
        repl = NamedSharding(mesh, P())
        self._centroids = jax.device_put(block_cents, repl)
        self._codebooks = jax.device_put(codebooks.astype(np.float32), repl)
        self._codes = jax.device_put(codes_psp[deal], shard3)
        self._rnorms = jax.device_put(rn_p[deal], shard2)
        # OPQ: codes quantize ROTATED residuals; the per-query LUT builds
        # from R·q (host-side small matmul in search())
        self._rotation = None if rotation is None else np.asarray(rotation, np.float32)
        self._steps: dict[tuple[int, int], callable] = {}

    def _make_step(
        self, k: int, nprobes: int, has_mask: bool = False, refine_k: int | None = None
    ):
        mesh = self.mesh
        nsub = self._codebooks.shape[0]
        dsub = self._codebooks.shape[2]
        kcode = self._codebooks.shape[1]
        s_pad = self._codes.shape[1]
        pmax = self.pmax
        shard_n = mesh.shape[SHARD_AXIS]
        nblocks_loc = self.nblocks // shard_n
        # static per-shard probe budget: every shard owns ≈ nprobes/shard_n
        # of a query's probes (blocks deal round-robin); 2× + slack keeps
        # the drop probability negligible, and a shard can never usefully
        # scan more than the blocks it owns
        budget = min(nprobes, nblocks_loc, 2 * (-(-nprobes // shard_n)) + 4)
        use_pallas = _pallas_available()

        def step(q, q_lut, centroids, codebooks, codes, rnorms, pen, *refine_args):
            def local(q_blk, q_lut_blk, cents, cbs, codes_loc, rn_loc, pen_loc, *ref_loc):
                if has_mask:
                    # prefilter/deletion penalty is additive into the
                    # residual-norm term of the ADC expansion, so a
                    # per-slot add before the scan masks filtered rows
                    # in BOTH the Pallas and XLA paths (clamped: PAD
                    # rnorm + PAD penalty must not overflow f32)
                    rn_loc = jnp.minimum(rn_loc + pen_loc, PAD)
                my_shard = jax.lax.axis_index(SHARD_AXIS)
                qb = q_blk.shape[0]
                qf = q_blk.astype(jnp.float32)
                dots = jnp.dot(
                    qf.astype(matmul_dtype()), cents.astype(matmul_dtype()).T,
                    preferred_element_type=jnp.float32,
                )
                cn2 = jnp.sum(jnp.square(cents), axis=-1)
                cd = jnp.sum(jnp.square(qf), -1, keepdims=True) - 2.0 * dots + cn2[None, :]
                _, probe_ids = topk_smallest(cd, nprobes)
                probe_dots = jnp.take_along_axis(dots, probe_ids, axis=1)
                # blocks deal round-robin: block b lives on shard b % shard_n
                owner = probe_ids % shard_n
                mine = owner == my_shard
                # compact my probes to the front, keep a static budget
                comp = jnp.argsort(jnp.logical_not(mine), axis=1, stable=True)[:, :budget]
                sel_ids = jnp.take_along_axis(probe_ids, comp, axis=1)  # (Q, B)
                sel_dots = jnp.take_along_axis(probe_dots, comp, axis=1)
                sel_mine = jnp.take_along_axis(mine, comp, axis=1)
                local_ids = jnp.where(sel_mine, sel_ids // shard_n, 0).astype(jnp.int32)
                qs = q_lut_blk.astype(jnp.float32).reshape(qb, nsub, dsub)
                dlut = jnp.einsum(
                    "qsd,skd->qsk", qs, cbs,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                if s_pad != nsub:
                    dlut = jnp.pad(dlut, ((0, 0), (0, s_pad - nsub), (0, 0)))
                qn2 = jnp.sum(jnp.square(qf), axis=-1)

                if use_pallas:
                    d = ivf_pq_adc_scan_pallas(
                        local_ids, dlut, codes_loc, rn_loc, sel_dots, qn2
                    )  # (Q, B, pmax)
                else:
                    dlut_b = dlut.astype(matmul_dtype())

                    def probe_step(j):
                        pid = local_ids[:, j]
                        codes_j = jnp.take(codes_loc, pid, axis=0)  # (Q, S, pmax)
                        rn_j = jnp.take(rn_loc, pid, axis=0)
                        oh = jax.nn.one_hot(
                            codes_j.astype(jnp.int32), kcode, dtype=matmul_dtype(), axis=-1
                        )
                        qdotr = jnp.einsum(
                            "qspk,qsk->qp", oh, dlut_b, preferred_element_type=jnp.float32
                        )
                        return qn2[:, None] - 2.0 * (sel_dots[:, j][:, None] + qdotr) + rn_j

                    d = jax.lax.map(probe_step, jnp.arange(budget)).transpose(1, 0, 2)

                d = jnp.where(sel_mine[:, :, None], d, PAD)
                # clamp to the per-shard candidate pool (k may exceed it
                # for small nprobes x refine_factor combinations)
                k_local = min(k, budget * pmax)
                vals, pos = topk_smallest(d.reshape(qb, -1), k_local)
                # local block index (into this shard's dealt arrays) and
                # global slot = block * pmax + offset
                lb = jnp.take_along_axis(local_ids, pos // pmax, axis=1)
                blk = jnp.take_along_axis(sel_ids, pos // pmax, axis=1)
                slots_out = blk * pmax + pos % pmax
                if refine_k is not None:
                    # mesh-native refine: each shard's candidates are its
                    # OWN rows, so the resident refine table shards with
                    # the blocks (zero replication). Rerank the local
                    # k·refine pool exactly, keep the local top-refine_k,
                    # and merge shards by EXACT distance — the union of
                    # local pools is a superset of the global PQ top
                    # pool, so recall >= the single-device fused refine.
                    rvec_loc, rn2_loc = ref_loc
                    off = pos % pmax
                    cand = rvec_loc[lb, off]                   # (Q, kl, D)
                    dots_r = jnp.einsum(
                        "qd,qcd->qc", qf.astype(rvec_loc.dtype), cand,
                        preferred_element_type=jnp.float32,
                    )
                    if self.metric == "cosine":
                        exact = 1.0 - dots_r                   # unit-norm both sides
                    else:
                        exact = jnp.maximum(
                            qn2[:, None] - 2.0 * dots_r + rn2_loc[lb, off], 0.0
                        )
                    exact = jnp.where(vals >= PAD / 2, PAD, exact)
                    kk = min(refine_k, exact.shape[1])
                    vals, rpos = topk_smallest(exact, kk)
                    slots_out = jnp.take_along_axis(slots_out, rpos, axis=1)
                k_merge = refine_k if refine_k is not None else k
                all_v = jax.lax.all_gather(vals, SHARD_AXIS, axis=1, tiled=True)
                all_s = jax.lax.all_gather(slots_out, SHARD_AXIS, axis=1, tiled=True)
                k_final = min(k_merge, all_v.shape[1] if all_v.shape[1] else k_merge)
                mv, mp = topk_smallest(all_v, min(k_final, all_v.shape[1]))
                return mv, jnp.take_along_axis(all_s, mp, axis=1)

            extra_specs = (
                ()
                if refine_k is None
                else (P(SHARD_AXIS, None, None), P(SHARD_AXIS, None))
            )
            return jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(
                    P(QUERY_AXIS), P(QUERY_AXIS), P(), P(),
                    P(SHARD_AXIS, None, None), P(SHARD_AXIS, None),
                    P(SHARD_AXIS, None),
                ) + extra_specs,
                out_specs=(P(QUERY_AXIS), P(QUERY_AXIS)),
                check_vma=False,
            )(q, q_lut, centroids, codebooks, codes, rnorms, pen, *refine_args)

        return jax.jit(step)

    def attach_refine_table(self, vecs_slot: np.ndarray, norms2_slot: np.ndarray,
                            dtype=None) -> None:
        """Shard a refine table over the mesh for the fused per-shard
        rerank. ``vecs_slot`` (num_slots, D) holds the ORIGINAL vectors
        in slot order (unit-norm for cosine, zeros on padding/dead
        slots); ``norms2_slot`` (num_slots,) their exact f32 squared
        norms. Dealt like codes/rnorms, so every shard reranks its own
        rows with zero replication. ``dtype`` overrides the resident
        precision (jnp.float32 for exact reranks; default matmul bf16)."""
        if vecs_slot.shape[0] != self.num_slots:
            raise ValueError(
                f"refine table has {vecs_slot.shape[0]} slots, index has {self.num_slots}"
            )
        shard3 = NamedSharding(self.mesh, P(SHARD_AXIS, None, None))
        vec_b = vecs_slot.reshape(self.nblocks, self.pmax, -1)[self._deal]
        self._refine_vecs = jax.device_put(
            jnp.asarray(vec_b, dtype=dtype if dtype is not None else matmul_dtype()),
            shard3,
        )
        self._refine_norms2 = jax.device_put(
            norms2_slot.astype(np.float32).reshape(self.nblocks, self.pmax)[self._deal],
            self._shard2,
        )

    @property
    def refine_attached(self) -> bool:
        return getattr(self, "_refine_vecs", None) is not None

    def slot_penalty(
        self,
        allowed_row_ids: np.ndarray | None,
        deleted_row_ids: np.ndarray | None,
        vanished_fragments: set[int] | None = None,
    ) -> np.ndarray | None:
        """Per-slot additive penalty in ORIGINAL block order (the same
        layout the single-device searcher uses — index/vector.py
        VectorSearcher.slot_penalty), sized to this index's shard-padded
        slot count."""
        no_deleted = deleted_row_ids is None or not len(deleted_row_ids)
        if allowed_row_ids is None and no_deleted and not vanished_fragments:
            return None
        penalty = np.zeros(self.num_slots, dtype=np.float32)
        rid = self.row_ids
        if allowed_row_ids is not None:
            penalty[~np.isin(rid, allowed_row_ids)] = PAD
        if not no_deleted:
            penalty[np.isin(rid, deleted_row_ids)] = PAD
        if vanished_fragments:
            frag_of = (rid >> np.uint64(32)).astype(np.int64)
            dead = np.isin(frag_of, np.fromiter(vanished_fragments, dtype=np.int64))
            penalty[dead] = PAD
        return penalty

    def search(self, queries: np.ndarray, k: int, nprobes: int = 20,
               slot_penalty: np.ndarray | None = None,
               refine_k: int | None = None):
        q = np.atleast_2d(np.asarray(queries, np.float32))
        if self.metric == "cosine":
            # the persisted index quantizes unit-normalized vectors; the
            # ADC scan then computes l2² = 2·(1−cos) (mirrors the
            # single-device cosine path, index/vector.py search())
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        nq = q.shape[0]
        qpar = self.mesh.shape[QUERY_AXIS]
        pad_q = (-nq) % max(qpar, 1)
        if pad_q:
            q = np.pad(q, ((0, pad_q), (0, 0)))
        # nprobes is block-granular (duplicate-centroid splitting)
        npb = min(
            self.nblocks,
            max(1, int(np.ceil(nprobes * self.nblocks / self.num_logical_partitions))),
        )
        has_mask = slot_penalty is not None
        if refine_k is not None and not self.refine_attached:
            raise ValueError("refine_k requires attach_refine_table first")
        key = (k, npb, has_mask, refine_k)
        if key not in self._steps:
            self._steps[key] = self._make_step(
                k, npb, has_mask=has_mask, refine_k=refine_k
            )
        if has_mask:
            pen = np.zeros(self.num_slots, dtype=np.float32)
            pen[: len(slot_penalty)] = slot_penalty  # single-device layouts are a prefix
            # deal into shard order the same way the blocks were dealt
            pen_j = jax.device_put(
                pen.reshape(self.nblocks, self.pmax)[self._deal], self._shard2
            )
        else:
            pen_j = jax.device_put(
                np.zeros((self.nblocks, 1), np.float32)[self._deal], self._shard2
            )
        qspec = NamedSharding(self.mesh, P(QUERY_AXIS, None))
        qj = jax.device_put(q, qspec)
        q_lut = q if self._rotation is None else q @ self._rotation.T
        qlj = jax.device_put(np.ascontiguousarray(q_lut), qspec)
        refine_args = (
            () if refine_k is None else (self._refine_vecs, self._refine_norms2)
        )
        vals, slots = self._steps[key](
            qj, qlj, self._centroids, self._codebooks, self._codes, self._rnorms,
            pen_j, *refine_args,
        )
        vals, slots = jax.device_get((vals, slots))  # one fused fetch
        vals = vals[:nq]
        slots = slots[:nq]
        rids = self.row_ids[self._deal_to_flat(slots)]
        invalid = vals >= np.float32(3.0e38) / 2
        rids = np.where(invalid, np.uint64(np.iinfo(np.uint64).max), rids)
        vals = np.where(invalid, np.inf, vals)
        if self.metric == "cosine" and refine_k is None:
            # unit-sphere l2² → cosine distance (matches single-device);
            # refined values are already true cosine distances
            vals = np.where(np.isfinite(vals), vals / 2.0, vals)
        k = refine_k if refine_k is not None else k
        if vals.shape[1] < k:
            # candidate pool smaller than requested k: pad (callers pad-
            # tolerate via the invalid markers, matching single-device)
            pad = k - vals.shape[1]
            vals = np.pad(vals, ((0, 0), (0, pad)), constant_values=np.inf)
            rids = np.pad(rids, ((0, 0), (0, pad)),
                          constant_values=np.uint64(np.iinfo(np.uint64).max))
        return vals, rids

    def _deal_to_flat(self, slots: np.ndarray) -> np.ndarray:
        """Global slot ids already index (block, offset) in dealt order —
        row_ids was scattered in block order, so this is the identity.
        Kept as a seam for layouts where shards reorder blocks."""
        return slots
