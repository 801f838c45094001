"""Vector index build + search: FLAT / IVF_FLAT / IVF_SQ / IVF_PQ.

Reference parity: these are the index families lancedb exposes
(index.rs:29-102) whose kernels live in the lance crates (SURVEY.md
§2.9 "Vector index build", "Scanner physical plans"). TPU-native
re-design (SURVEY.md §7):

* Partitions live as PADDED dense blocks ``(num_partitions, pmax, …)``
  in HBM — XLA needs static shapes, so ragged IVF lists become padded
  blocks with an additive +inf penalty on padding slots. ``jnp.take``
  over the leading partition axis turns nprobe selection into
  contiguous block gathers (DMA-friendly).
* All distance work is matmuls (see ops/): partition selection is one
  (Q, P) matmul; the probed IVF_FLAT/SQ scan is a batched matvec over
  gathered blocks; the IVF_PQ scan dequantizes residual codes with a
  one-hot einsum and reuses the partition-selection matmul for the
  q·centroid term:  d = |q|² − 2(q·c_p + q·r̃) + |c_p + r̃|².
* Search returns dense (Q, k) global slot ids; the host maps slots →
  stable row addresses with one numpy take.

Deletes/filters enter as a per-slot penalty vector (prefilter
semantics — reference query.rs `prefilter`); unindexed fragments are
brute-forced and merged by the query layer (delta-index semantics).
"""

from __future__ import annotations

import io
import json
import logging
import os
import time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..arrow import fsl_to_numpy
from ..errors import InvalidInputError
from ..io.object_store import ObjectStore
from ..ops.distance import normalize_metric, pairwise_distance, refine_distances
from ..ops.kmeans import assign_residuals_device, ivf_train_assign_device, kmeans_fit
from ..ops.pallas_adc import PMAX_ALIGN, S_ALIGN, ivf_pq_adc_scan_pallas
from ..ops.pallas_group_scan import ivf_flat_grouped_scan_pallas

logger = logging.getLogger("lancedb_tpu.index")
from ..ops.pq import (
    default_num_sub_vectors,
    opq_train,
    pq_build_device,
    pq_encode_rnorms,
    pq_train,
)
from ..ops.topk import approx_topk_smallest, topk_smallest
from ..ops.util import matmul_dtype, round_up
from ..storage.manifest import IndexMeta, new_uuid
from . import default_num_partitions

PAD_PENALTY = np.float32(3.0e38)

_PALLAS_OK: bool | None = None


def _pallas_available() -> bool:
    """Fused Pallas kernels run only on real TPU backends (the CPU/test
    path uses the XLA formulations; interpret mode is for unit tests)."""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        _PALLAS_OK = jax.default_backend() == "tpu"
    return _PALLAS_OK

# query-batch buckets: queries are padded up so jit caches stay small.
# 128 is also the per-device-call cap — the probed gather is
# O(Q · nprobes · pmax · D), so larger batches are chunked host-side to
# bound HBM transients.
_Q_BUCKETS = (8, 32, 128)
_Q_CHUNK = 128


def _q_bucket(q: int) -> int:
    for b in _Q_BUCKETS:
        if q <= b:
            return b
    return _Q_BUCKETS[-1]


@dataclass
class SearchParams:
    """Per-query knobs (reference VectorQueryRequest, query.rs:1067-1114)."""

    k: int = 10
    nprobes: int = 20  # minimum_nprobes default (query.rs:1103)
    refine_factor: int | None = None
    lower_bound: float | None = None
    upper_bound: float | None = None
    ef: int | None = None  # HNSW search width
    precision: str = "default"  # 'default' | 'float32' | 'bfloat16'
    # reference ApproxMode (lib.rs:299-307): 'accurate' forces exact
    # top-k selection; 'normal'/'fast' allow the TPU-native partial-
    # reduce top-k (lax.approx_max_k) inside quantized scans
    approx_mode: str = "normal"
    # planner override: True forces probed scans even for large batches
    # where a shared full scan would be faster (None = auto)
    use_index_for_batch: bool | None = None


# --------------------------------------------------------------- save/load


def _save_npy(store: ObjectStore, path: str, arr: np.ndarray) -> None:
    buf = io.BytesIO()
    np.save(buf, arr)
    store.write_bytes(path, buf.getvalue())


def _load_npy(store: ObjectStore, path: str) -> np.ndarray:
    local = store.local_path(path)
    if local is not None:
        return np.load(local, mmap_mode="r")
    return np.load(io.BytesIO(store.read_bytes(path)))


# ------------------------------------------------------------------ build


def _resolve_nsub(config, dim: int) -> int:
    """num_sub_vectors default + the 4-bit even bump (create_index.rs:94-100)."""
    nsub = config.num_sub_vectors or default_num_sub_vectors(dim)
    if (
        config.num_sub_vectors is None
        and config.num_bits == 4
        and nsub % 2
        and dim % (nsub + 1) == 0
    ):
        nsub += 1
    return nsub


def _start_build_warmup(
    n, dim, nparts, n_sample, n_pool, chunk, build_dtype,
    coarse_args, config, index_type,
):
    """Warm the build-path device programs concurrently.

    The axon tunnel's first execution of a program pays a remote-compile
    cost that is large and wildly variable (measured 2–500 s,
    independent of program size — a shared compile queue). Warming the
    coarse and PQ programs in background threads with device-created
    zeros (nothing crosses the tunnel) overlaps both compile draws with
    each other and with the table upload; the real calls then dispatch
    in milliseconds. Off-TPU (tests) compiles are local and cheap — skip.
    """
    if jax.default_backend() == "cpu":
        return []
    import threading

    max_iters = config.max_iterations

    def warm_coarse():
        ivf_train_assign_device(
            jnp.zeros((n, dim), build_dtype),
            jnp.zeros((n_sample,), jnp.int32),
            jnp.zeros((n_pool,), jnp.int32),
            jax.random.PRNGKey(0),
            jnp.zeros((max_iters, nparts), jnp.int32),
            **coarse_args,
        )[0].block_until_ready()

    threads = [threading.Thread(target=warm_coarse, daemon=True)]
    if index_type == "IVF_PQ" and not getattr(config, "opq", False):
        n_pad = ((n + chunk - 1) // chunk) * chunk if n > chunk else n
        kcode = 1 << config.num_bits
        nsub = _resolve_nsub(config, dim)
        n_train = min(n, config.sample_rate * kcode)
        n_pq_pool = min(n_train, 32 * kcode)

        res_dt = (
            jnp.bfloat16
            if coarse_args.get("residual_dtype") == "bfloat16" else jnp.float32
        )

        def warm_pq():
            pq_build_device(
                jnp.zeros((n_pad, dim), res_dt),
                jnp.zeros((nparts, dim), jnp.float32),
                jnp.zeros((n_pad,), jnp.int32),
                jnp.zeros((n_train,), jnp.int32),
                jnp.zeros((n_pq_pool,), jnp.int32),
                jnp.zeros((nsub, 2), jnp.uint32),
                jnp.zeros((max_iters, kcode), jnp.int32),
                jnp.zeros((1, 1), jnp.float32),
                nsub=nsub, kcode=kcode, max_iters=max_iters,
                chunk=min(chunk, n), has_rotation=False,
            )[0].block_until_ready()

        threads.append(threading.Thread(target=warm_pq, daemon=True))
    for t in threads:
        t.start()
    return threads


def _collect_vectors(dataset, column: str) -> tuple[np.ndarray, np.ndarray, list[int]]:
    """Read (vectors, row_ids, fragment_ids) for all live rows."""
    mats, rids, frag_ids = [], [], []
    for meta, tbl in dataset.scan_fragments(columns=[column], with_row_id=True):
        mats.append(fsl_to_numpy(tbl.column(column)))
        rids.append(tbl.column("_rowid").to_numpy().astype(np.uint64))
        frag_ids.append(meta.id)
    if not mats:
        raise InvalidInputError("cannot build a vector index on an empty table")
    return np.concatenate(mats), np.concatenate(rids), frag_ids


def _partition_layout(
    assign: np.ndarray, num_partitions: int, pad_multiple: int = 8
) -> tuple[np.ndarray, np.ndarray, int]:
    """Sort rows by partition → (order, counts, pmax)."""
    order = np.argsort(assign, kind="stable")
    counts = np.bincount(assign, minlength=num_partitions)
    pmax = int(round_up(max(1, counts.max()), pad_multiple))
    return order, counts, pmax


def _balanced_layout(
    assign: np.ndarray, centroids: np.ndarray, pad_multiple: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Split oversized k-means partitions into duplicate-centroid blocks.

    Padded dense IVF blocks cost HBM and scan time proportional to the
    LARGEST partition, so heavy-tailed k-means assignments (several
    natural clusters merged into one partition) inflate every probe.
    Rows of a partition with count > cap are split across
    ceil(count/cap) blocks that share the partition's centroid: probe
    selection ranks blocks, duplicated centroids rank adjacently, so a
    query spending n probes on a fat logical partition scans the same
    rows the reference's single fat partition would (nprobes is
    block-granular; the searcher rescales, see VectorSearcher.search).
    Empty partitions get no block. Returns (order, block_centroids,
    block_counts, pmax).
    """
    num_partitions = centroids.shape[0]
    order = np.argsort(assign, kind="stable")
    counts = np.bincount(assign, minlength=num_partitions)
    mean = max(1.0, float(len(assign)) / max(1, (counts > 0).sum()))
    # cap factor is sweepable for perf probing: scan cost per probe is
    # ∝ pmax while probe count rescales by blocks/logical, so the fill
    # fraction N/(blocks·pmax) decides wasted MXU/HBM work
    cap_factor = float(os.environ.get("LANCEDB_TPU_BLOCK_CAP_FACTOR", "1.25"))
    cap = int(round_up(max(pad_multiple, int(cap_factor * mean)), pad_multiple))
    block_counts, block_pids = [], []
    for pid in range(num_partitions):
        c = int(counts[pid])
        while c > 0:
            take = min(c, cap)
            block_counts.append(take)
            block_pids.append(pid)
            c -= take
    block_counts = np.asarray(block_counts, dtype=np.int64)
    block_pids = np.asarray(block_pids, dtype=np.int32)
    pmax = int(round_up(max(1, block_counts.max()), pad_multiple))
    fill = len(assign) / max(1, len(block_counts) * pmax)
    logger.debug(
        "ivf layout: %d logical -> %d blocks, pmax=%d, fill=%.3f (cap=%d)",
        num_partitions, len(block_counts), pmax, fill, cap,
    )
    return order, centroids[block_pids], block_counts, pmax


def _scatter_padded(
    values: np.ndarray, order: np.ndarray, counts: np.ndarray, pmax: int, fill=0
) -> np.ndarray:
    """(N, …) sorted-by-partition → (P, pmax, …) padded."""
    p = len(counts)
    out_shape = (p, pmax) + values.shape[1:]
    out = np.full(out_shape, fill, dtype=values.dtype)
    sorted_vals = values[order]
    start = 0
    for pid in range(p):
        c = counts[pid]
        if c:
            out[pid, :c] = sorted_vals[start : start + c]
        start += c
    return out


def build_vector_index(
    dataset,
    column: str,
    config,
    name: str | None = None,
) -> IndexMeta:
    """Train + encode + persist one vector index; returns its catalog entry.

    Build path mirrors reference create_index (SURVEY.md §3.3): sampled
    k-means on device → assign all rows → partitioned layout → (PQ/SQ)
    encode on device → persist artifacts → commit manifest entry.
    """
    t0 = time.time()
    metric = normalize_metric(config.distance_type)
    vectors, row_ids, frag_ids = _collect_vectors(dataset, column)
    n, dim = vectors.shape
    uuid = new_uuid()
    store: ObjectStore = dataset.store
    prefix = dataset.index_dir(uuid)
    index_type = config.index_type

    meta_doc: dict = {
        "index_type": index_type,
        "column": column,
        "metric": metric,
        "dim": dim,
        "num_rows": n,
    }

    if metric == "cosine":
        # normalize once at build: cosine == l2²/2 on the unit sphere
        norms = np.linalg.norm(vectors, axis=1, keepdims=True)
        vectors = vectors / np.maximum(norms, 1e-30)

    if index_type == "FLAT":
        _save_npy(store, f"{prefix}/vectors.npy", vectors)
        _save_npy(store, f"{prefix}/row_ids.npy", row_ids)
    else:
        nparts = config.num_partitions or default_num_partitions(n)
        if nparts > n:
            raise InvalidInputError(f"num_partitions {nparts} > num_rows {n}")
        if index_type == "IVF_PQ" and config.num_bits not in (4, 8):
            # InvalidInputError subclasses ValueError: both error
            # surfaces (reference-style typed + stdlib) catch it
            raise InvalidInputError("num_bits must be 4 or 8")
        train_metric = "l2" if metric == "cosine" else metric
        # Device-resident build: the table uploads ONCE; k-means training,
        # assignment, residuals, and PQ encode all run on-device, and only
        # small artifacts (assign/codes/rnorms) come back. The coarse and
        # PQ stages are each ONE fused program (ivf_train_assign_device /
        # pq_build_device): the axon tunnel charges a large variable
        # remote-compile cost per program, so fewer programs = fewer
        # compile-queue draws — and both compiles are WARMED concurrently
        # (zeros input, created on device) while the table uploads.
        need_res = index_type in ("IVF_PQ", "IVF_RQ")
        # large-D HBM discipline: the per-chunk (chunk, K) distance
        # transient and the residual buffer both scale with D — at
        # 1M x 960 an f32 residual buffer alone is 3.8 GB, which OOMs a
        # 16 GB v5e next to the resident table. Smaller chunks + bf16
        # residuals keep the build inside HBM; PQ code selection is
        # insensitive to residual precision and rnorms reconstruct from
        # codebooks.
        chunk = 1 << 17 if dim <= 256 else 1 << 15
        # capacity mode: beyond ~15M x 128 the bf16 table AND a bf16
        # residual buffer no longer co-reside in 16 GB HBM — form
        # residuals in-register per chunk instead (pq from_raw), skip
        # the zero-buffer compile warmup (its (n, d) zeros would sit
        # next to the real table), and lean on the persistent compile
        # cache for the first-call compiles.
        res_free = (
            index_type == "IVF_PQ"
            and not getattr(config, "opq", False)
            and n * dim * 4 > 8_000_000_000
        )
        rng = np.random.default_rng(config.seed)
        n_sample = min(n, config.sample_rate * nparts)
        n_pool = min(n_sample, max(32 * nparts, 4 * nparts))
        sel = (
            rng.choice(n, size=n_sample, replace=False)
            if n_sample < n else np.arange(n)
        ).astype(np.int32)
        pool_sel = (
            rng.choice(n_sample, size=n_pool, replace=False)
            if n_pool < n_sample else np.arange(n_sample)
        ).astype(np.int32)
        reseed = rng.integers(0, n_sample, size=(config.max_iterations, nparts)).astype(np.int32)
        build_dtype = (
            jnp.float32
            if getattr(config, "build_precision", "bfloat16") == "float32"
            or jax.default_backend() == "cpu"
            else jnp.bfloat16
        )
        res_dtype = (
            "bfloat16"
            if need_res and build_dtype == jnp.bfloat16 and n * dim * 4 > 2_000_000_000
            else "float32"
        )
        coarse_args = dict(
            k=nparts, max_iters=config.max_iterations, metric=train_metric,
            chunk=min(chunk, n), with_residuals=need_res and not res_free,
            residual_dtype=res_dtype,
        )
        warm_threads = [] if res_free else _start_build_warmup(
            n, dim, nparts, n_sample, n_pool, chunk, build_dtype,
            coarse_args, config, index_type,
        )
        # the bf16 cast halves tunnel upload bytes (~19 MB/s); the assign
        # matmul already ran in bf16, and PQ codes / RQ signs quantize far
        # more coarsely than the cast does
        host_x = vectors.astype(build_dtype)
        if res_free:
            # pre-pad on host so the raw table IS the chunk-aligned
            # buffer the pq encode scans (a device-side pad would hold
            # two (n, d) buffers alive mid-copy)
            n_pad_rf = ((n + chunk - 1) // chunk) * chunk
            if n_pad_rf != n:
                host_x = np.pad(host_x, ((0, n_pad_rf - n), (0, 0)))
        xd = jnp.asarray(host_x)
        del host_x
        for t in warm_threads:
            t.join()
        cents_d, assign_d, residuals_d = ivf_train_assign_device(
            xd,
            jnp.asarray(sel),
            jnp.asarray(pool_sel),
            jax.random.PRNGKey(config.seed),
            jnp.asarray(reseed),
            **coarse_args,
        )
        centroids = np.asarray(cents_d)
        assign = np.asarray(assign_d[:n])
        # PQ blocks must be lane-aligned for the Pallas ADC kernel
        pad_multiple = PMAX_ALIGN if index_type == "IVF_PQ" else 8
        order, block_centroids, counts, pmax = _balanced_layout(
            assign, centroids, pad_multiple=pad_multiple
        )
        rid_padded = _scatter_padded(row_ids.view(np.int64), order, counts, pmax, fill=-1)
        _save_npy(store, f"{prefix}/centroids.npy", block_centroids)
        _save_npy(store, f"{prefix}/row_ids.npy", rid_padded)
        _save_npy(store, f"{prefix}/counts.npy", counts.astype(np.int32))
        meta_doc.update(
            num_partitions=len(counts), num_logical_partitions=nparts, pmax=pmax
        )

        if index_type == "IVF_FLAT":
            vec_padded = _scatter_padded(vectors, order, counts, pmax)
            _save_npy(store, f"{prefix}/vectors.npy", vec_padded)
            meta_doc["precision"] = getattr(config, "precision", "float32")
        elif index_type == "IVF_SQ":
            # int8 scalar quantization of raw vectors: per-dim affine
            lo = vectors.min(axis=0)
            hi = vectors.max(axis=0)
            scale = np.maximum((hi - lo) / 255.0, 1e-12).astype(np.float32)
            codes = np.clip(np.round((vectors - lo) / scale), 0, 255).astype(np.uint8)
            deq = codes.astype(np.float32) * scale + lo
            norms2 = np.sum(deq.astype(np.float64) ** 2, axis=1).astype(np.float32)
            _save_npy(store, f"{prefix}/codes.npy", _scatter_padded(codes, order, counts, pmax))
            _save_npy(
                store,
                f"{prefix}/norms.npy",
                _scatter_padded(norms2, order, counts, pmax, fill=PAD_PENALTY),
            )
            _save_npy(store, f"{prefix}/sq_scale.npy", scale)
            _save_npy(store, f"{prefix}/sq_offset.npy", lo.astype(np.float32))
        elif index_type == "IVF_RQ":
            # RaBitQ-style 1-bit residual quantization: residuals are
            # rotated by a seeded orthonormal matrix, sign-quantized to
            # ±1 bits (32× smaller than f32), with a per-row scale that
            # minimizes L2 error for sign quantization (s = mean|u_i|).
            # Reconstruction: x̂ = c_p + Rᵀ(s·sign(u)); the scan is a
            # ±1 matmul against the rotated query (MXU via bit-unpack).
            rng_r = np.random.default_rng(config.seed + 7)
            gauss = rng_r.standard_normal((dim, dim)).astype(np.float32)
            rot, _ = np.linalg.qr(gauss)
            rot = rot.astype(np.float32)
            residuals = np.asarray(residuals_d[:n])
            u = residuals @ rot.T  # rotated residuals
            signs = u > 0
            scales = np.mean(np.abs(u), axis=1).astype(np.float32)  # per row
            bits = np.packbits(signs, axis=1, bitorder="little")
            recon_rot = scales[:, None] * np.where(signs, 1.0, -1.0).astype(np.float32)
            recon = recon_rot @ rot + centroids[assign]
            rnorms = np.sum(recon.astype(np.float64) ** 2, axis=1).astype(np.float32)
            _save_npy(store, f"{prefix}/bits.npy", _scatter_padded(bits, order, counts, pmax))
            _save_npy(
                store,
                f"{prefix}/scales.npy",
                _scatter_padded(scales, order, counts, pmax),
            )
            _save_npy(
                store,
                f"{prefix}/rnorms.npy",
                _scatter_padded(rnorms, order, counts, pmax, fill=PAD_PENALTY),
            )
            _save_npy(store, f"{prefix}/rotation.npy", rot)
            meta_doc.update(num_bits=1)
        elif index_type == "IVF_PQ":
            nsub = _resolve_nsub(config, dim)
            if getattr(config, "opq", False):
                # OPQ alternates host-side Procrustes with PQ training —
                # an opt-in slow path that keeps the original staging
                res_d = residuals_d[:n]
                train_rows = min(n, config.sample_rate * 256)
                sel_pq = np.random.default_rng(config.seed + 1).choice(
                    n, size=train_rows, replace=False
                ) if train_rows < n else np.arange(n)
                res_sample = np.asarray(res_d[jnp.asarray(sel_pq)])
                rotation, codebooks = opq_train(
                    res_sample,
                    nsub,
                    num_bits=config.num_bits,
                    opq_iters=getattr(config, "opq_iters", 8),
                    max_iters=config.max_iterations,
                    sample_rate=config.sample_rate,
                    seed=config.seed,
                )
                _save_npy(store, f"{prefix}/rotation.npy", rotation)
                meta_doc["opq"] = True
                codes, rnorms = pq_encode_rnorms(
                    res_d, cents_d, assign_d[:n], codebooks, rotation=rotation
                )
            else:
                # codebook train + encode + |x̂|² — ONE device program,
                # warmed above; the training sample never leaves the device
                kcode = 1 << config.num_bits
                rng_pq = np.random.default_rng(config.seed + 1)
                n_train = min(n, config.sample_rate * kcode)
                sel_pq = (
                    rng_pq.choice(n, size=n_train, replace=False)
                    if n_train < n else np.arange(n)
                ).astype(np.int32)
                n_pq_pool = min(n_train, 32 * kcode)
                pq_pool_sel = (
                    rng_pq.choice(n_train, size=n_pq_pool, replace=False)
                    if n_pq_pool < n_train else np.arange(n_train)
                ).astype(np.int32)
                reseed_pq = rng_pq.integers(
                    0, n_train, size=(config.max_iterations, kcode)
                ).astype(np.int32)
                codebooks_d, codes_d, rnorms_d = pq_build_device(
                    xd if res_free else residuals_d,
                    cents_d,
                    assign_d,
                    jnp.asarray(sel_pq),
                    jnp.asarray(pq_pool_sel),
                    jax.random.split(jax.random.PRNGKey(config.seed), nsub),
                    jnp.asarray(reseed_pq),
                    jnp.zeros((1, 1), jnp.float32),
                    nsub=nsub, kcode=kcode, max_iters=config.max_iterations,
                    chunk=min(chunk, n), has_rotation=False,
                    from_raw=res_free,
                )
                codebooks = np.asarray(codebooks_d)
                codes = np.asarray(codes_d[:n])
                rnorms = np.asarray(rnorms_d[:n])
            # codes live as (P, S_pad, pmax) — subvectors on sublanes,
            # slots on lanes — the layout the Pallas ADC kernel scans
            # without any in-HBM gather (ops/pallas_adc.py). S pads with
            # code 0 + zero LUT rows; pmax pads are masked by +inf rnorms.
            codes_psp = _scatter_padded(codes, order, counts, pmax).transpose(0, 2, 1)
            s_pad = round_up(nsub, S_ALIGN)
            if s_pad != nsub:
                codes_psp = np.pad(codes_psp, ((0, 0), (0, s_pad - nsub), (0, 0)))
            _save_npy(store, f"{prefix}/codes.npy", np.ascontiguousarray(codes_psp))
            _save_npy(store, f"{prefix}/codebooks.npy", codebooks)
            _save_npy(
                store,
                f"{prefix}/rnorms.npy",
                _scatter_padded(rnorms, order, counts, pmax, fill=PAD_PENALTY),
            )
            meta_doc.update(num_sub_vectors=nsub, num_bits=config.num_bits)
        else:
            raise InvalidInputError(f"unsupported vector index type {index_type!r}")

    meta_doc["build_seconds"] = time.time() - t0
    store.write_bytes(f"{prefix}/meta.json", json.dumps(meta_doc).encode())
    return IndexMeta(
        name=name or f"{column}_idx",
        uuid=uuid,
        columns=[column],
        index_type=index_type,
        params=meta_doc,
        fragment_ids=frag_ids,
        num_indexed_rows=n,
        created_at=time.time(),
    )


# ------------------------------------------------------------------ search


@partial(jax.jit, static_argnames=("k", "metric", "mode"))
def _flat_search_device(q, vectors, vectors_lp, norms2, penalty, k: int, metric: str, mode: str):
    """Brute-force scan. vectors: (N, D) f32; vectors_lp: the SAME rows
    pre-cast to the matmul dtype and resident on device — casting
    inside the scan would read 4 B/element from HBM where the bf16
    coarse pass only needs 2 (measured: the in-jit cast capped the scan
    at ~48% of the v5e HBM roofline). Three precision modes:

    * 'float32'  — exact f32 matmul (HIGHEST) + exact top-k
    * 'bfloat16' — bf16 matmul + approx top-k (fastest, ~0.97 recall)
    * 'default'  — TWO-PASS: bf16 coarse scan at MXU rate selects 8·k
      candidates with the TPU partial-reduce top-k, then an exact f32
      rerank of just those rows — exact-search results at ~bf16 speed
      (the TPU-native formulation of the reference's full-precision
      flat scan)
    """
    qf = q.astype(jnp.float32)

    def coarse_dists(src, prec):
        dots = jnp.dot(
            qf.astype(src.dtype), src.T,
            precision=prec, preferred_element_type=jnp.float32,
        )
        if metric == "dot":
            d = -dots
        elif metric == "cosine":
            qn = jnp.sqrt(jnp.sum(jnp.square(qf), axis=-1, keepdims=True))
            d = 1.0 - dots / jnp.maximum(qn, 1e-30)  # index pre-normalized
        else:
            qn2 = jnp.sum(jnp.square(qf), axis=-1, keepdims=True)
            d = jnp.maximum(qn2 - 2.0 * dots + norms2[None, :], 0.0)
        return d + penalty[None, :]

    if mode == "float32":
        return topk_smallest(coarse_dists(vectors, jax.lax.Precision.HIGHEST), k)
    if mode == "bfloat16":
        return approx_topk_smallest(coarse_dists(vectors_lp, None), k)
    # two-pass: coarse bf16 candidates → exact f32 rerank
    n = vectors.shape[0]
    kc = min(max(8 * k, 64), n)
    _, cand = approx_topk_smallest(coarse_dists(vectors_lp, None), kc)
    xc = jnp.take(vectors, cand, axis=0).astype(jnp.float32)  # (Q, kc, D)
    if metric == "dot":
        d2 = -jnp.einsum("qd,qcd->qc", qf, xc, precision=jax.lax.Precision.HIGHEST)
    elif metric == "cosine":
        qn = jnp.sqrt(jnp.sum(jnp.square(qf), axis=-1, keepdims=True))
        dots = jnp.einsum("qd,qcd->qc", qf, xc, precision=jax.lax.Precision.HIGHEST)
        d2 = 1.0 - dots / jnp.maximum(qn, 1e-30)
    else:
        d2 = jnp.sum(jnp.square(qf[:, None, :] - xc), axis=-1)
    d2 = d2 + jnp.take(penalty, cand)
    vals, pos = topk_smallest(d2, k)
    return vals, jnp.take_along_axis(cand, pos, axis=1)


@partial(jax.jit, static_argnames=("k", "metric", "has_mask"))
def _ivf_full_scan_device(
    q, vectors, norms2, slot_penalty, k: int, metric: str, has_mask: bool
):
    """Scan an IVF_FLAT index as a flat table (batched-query planner path).

    For large query batches the per-query probed gather reads MORE HBM
    than one shared pass over the whole padded block array
    (qb·nprobes·pmax ≥ total slots), so the planner flattens the blocks
    and runs a flat scan instead — recall is a superset of any nprobes
    setting. Padding slots carry +inf norms; an explicit penalty keeps
    them (and filtered rows) out for dot/cosine too.

    IMPORTANT: the scan runs in exact-f32 mode, never the two-pass
    approx mode. The block layout sorts rows by partition, so a query's
    true neighbors sit in ADJACENT slots — adversarial for
    lax.approx_max_k's tile-wise partial reduction, which keeps roughly
    one winner per tile (measured: 0.93 recall vs 1.0 exact). The
    two-pass trick stays for FLAT indexes, whose rows keep insertion
    order.
    """
    nslots = vectors.shape[0] * vectors.shape[1]
    flat_vecs = vectors.reshape(nslots, -1)
    flat_norms = norms2.reshape(nslots)
    pen = jnp.where(flat_norms >= PAD_PENALTY, PAD_PENALTY, 0.0)
    if has_mask:
        pen = pen + slot_penalty
    return _flat_search_device(
        q, flat_vecs, flat_vecs, flat_norms, pen, k=k, metric=metric, mode="float32"
    )


@partial(jax.jit, static_argnames=("nprobes", "metric"))
def _select_probes(q, centroids, nprobes: int, metric: str):
    """(Q, P) centroid distances → top-nprobes partitions + q·c dots."""
    qf = q.astype(jnp.float32)
    dots = jnp.dot(
        qf.astype(matmul_dtype()), centroids.astype(matmul_dtype()).T,
        preferred_element_type=jnp.float32,
    )  # (Q, P)
    if metric == "dot":
        d = -dots
    else:
        cn2 = jnp.sum(jnp.square(centroids), axis=-1)
        qn2 = jnp.sum(jnp.square(qf), axis=-1, keepdims=True)
        d = qn2 - 2.0 * dots + cn2[None, :]
    _, probe_ids = topk_smallest(d, nprobes)
    probe_dots = jnp.take_along_axis(dots, probe_ids, axis=1)
    return probe_ids, probe_dots


@partial(
    jax.jit, static_argnames=("k", "nprobes", "metric", "has_mask", "use_pallas")
)
def _ivf_flat_search_device(
    q, centroids, vectors, norms2, slot_penalty, k: int, nprobes: int, metric: str,
    has_mask: bool, use_pallas: bool = False,
):
    """vectors: (P, pmax, D); norms2: (P, pmax) with +inf padding.

    On TPU (use_pallas) each probed block DMAs straight from HBM inside
    the fused Pallas scan (ops/pallas_scan.py) — no gathered tensor.
    The XLA fallback gathers probes in chunks (lax.map) so the
    transient stays bounded at (Q, chunk, pmax, D) regardless of
    nprobes.
    """
    qb, dim = q.shape
    pmax = vectors.shape[1]
    probe_ids, _ = _select_probes(q, centroids, nprobes, metric)
    qf = q.astype(jnp.float32)

    # the fused scan needs lane-aligned dims; other shapes take the
    # XLA chunked-gather fallback below
    if use_pallas and not (dim % 128 == 0 and pmax % 8 == 0):
        use_pallas = False
    if use_pallas:
        if metric == "l2":
            alpha = jnp.full((qb,), -2.0, jnp.float32)
            gamma = jnp.sum(jnp.square(qf), axis=-1)
            norms_in = norms2
        else:
            pad_pen = jnp.where(norms2 >= PAD_PENALTY, PAD_PENALTY, 0.0)
            if metric == "cosine":  # index vectors pre-normalized
                qn = jnp.maximum(
                    jnp.sqrt(jnp.sum(jnp.square(qf), axis=-1)), 1e-30
                )
                alpha = -1.0 / qn
                gamma = jnp.ones((qb,), jnp.float32)
            else:  # dot
                alpha = jnp.full((qb,), -1.0, jnp.float32)
                gamma = jnp.zeros((qb,), jnp.float32)
            norms_in = pad_pen
        if has_mask:
            norms_in = norms_in + slot_penalty.reshape(norms2.shape)
        # query-grouped fused scan (ops/pallas_group_scan.py): pairs are
        # grouped by partition so each probed block DMAs ~once per batch
        # and the per-group compute is an MXU matmul. Measured (v5e,
        # 1402x1224x128, batch 128, np=28, scripts/ab_groupscan.py):
        # 6.2 ms vs 8.1 ms XLA chunked gather and 14.9 ms for the old
        # one-pair-per-cell kernel; scan+exact-top-k 5.6 ms end to end.
        d = ivf_flat_grouped_scan_pallas(probe_ids, qf, vectors, norms_in, alpha, gamma)
        vals, pos = topk_smallest(d.reshape(qb, -1), k)
        slots = jnp.take_along_axis(probe_ids, pos // pmax, axis=1) * pmax + pos % pmax
        return vals, slots
    # storage dtype decides scan precision: f32-stored partitions rank
    # exactly (HIGHEST avoids the MXU's default bf16 input rounding)
    scan_f32 = vectors.dtype == jnp.float32
    qs = qf if scan_f32 else qf.astype(matmul_dtype())
    qn = jnp.sqrt(jnp.sum(jnp.square(qf), axis=-1))[:, None, None]
    qn2 = jnp.sum(jnp.square(qf), axis=-1)[:, None, None]

    chunk = max(1, min(nprobes, (1 << 28) // max(1, qb * pmax * dim)))
    n_chunks = -(-nprobes // chunk)
    pad_probes = n_chunks * chunk - nprobes
    pids_c = jnp.pad(probe_ids, ((0, 0), (0, pad_probes))).reshape(qb, n_chunks, chunk)

    def scan_chunk(pid):  # pid: (Q, chunk)
        g_vecs = jnp.take(vectors, pid, axis=0)  # (Q, c, pmax, D)
        g_norm = jnp.take(norms2, pid, axis=0)  # (Q, c, pmax)
        dots = jnp.einsum(
            "qnpd,qd->qnp",
            g_vecs if scan_f32 else g_vecs.astype(matmul_dtype()),
            qs,
            precision=jax.lax.Precision.HIGHEST if scan_f32 else None,
            preferred_element_type=jnp.float32,
        )
        if metric == "dot":
            d = -dots + jnp.where(g_norm >= PAD_PENALTY, PAD_PENALTY, 0.0)
        elif metric == "cosine":
            d = 1.0 - dots / jnp.maximum(qn, 1e-30)
            d = d + jnp.where(g_norm >= PAD_PENALTY, PAD_PENALTY, 0.0)
        else:
            d = qn2 - 2.0 * dots + g_norm
        if has_mask:
            d = d + jnp.take(slot_penalty.reshape(centroids.shape[0], pmax), pid, axis=0)
        return d  # (Q, c, pmax)

    if n_chunks == 1:
        d = scan_chunk(pids_c[:, 0])
    else:
        d = jax.lax.map(scan_chunk, pids_c.transpose(1, 0, 2))  # (nc, Q, c, pmax)
        d = d.transpose(1, 0, 2, 3).reshape(qb, n_chunks * chunk, pmax)
    d = d.reshape(qb, -1)
    if pad_probes:
        # padded probe slots duplicated partition 0 for some queries —
        # mask them so duplicates can't surface twice
        probe_valid = jnp.arange(n_chunks * chunk) < nprobes
        d = jnp.where(jnp.repeat(probe_valid, pmax)[None, :], d, PAD_PENALTY)
    vals, pos = topk_smallest(d, k)
    probe_ids = pids_c.reshape(qb, -1)
    # local position → global slot = partition * pmax + offset
    probe_of = pos // pmax
    off = pos % pmax
    slots = jnp.take_along_axis(probe_ids, probe_of, axis=1) * pmax + off
    return vals, slots


def _pq_dlut(q, codebooks, s_pad: int):
    """Per-query dot LUT dlut[q, s, c] = q_s · cb[s, c] → (Q, S_pad, K) f32
    with zero rows for padded subvectors (their code-0 entries add 0)."""
    qb = q.shape[0]
    nsub, kcode, dsub = codebooks.shape
    qs = q.astype(jnp.float32).reshape(qb, nsub, dsub)
    dlut = jnp.einsum(
        "qsd,skd->qsk", qs, codebooks.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )
    if s_pad != nsub:
        dlut = jnp.pad(dlut, ((0, 0), (0, s_pad - nsub), (0, 0)))
    return dlut


@partial(
    jax.jit,
    static_argnames=("k", "nprobes", "metric", "has_mask", "use_pallas", "exact_sel"),
)
def _ivf_pq_search_device(
    q,
    centroids,
    codes,
    rnorms,
    codebooks,
    slot_penalty,
    k: int,
    nprobes: int,
    metric: str,
    has_mask: bool,
    use_pallas: bool = False,
    exact_sel: bool = True,
    rotation=None,
):
    """Residual-PQ ADC scan over probed partitions.

    codes: (P, S_pad, pmax) uint8 — subvectors on sublanes, slots on
    lanes; rnorms: (P, pmax) = |c_p + r̃|² (+inf pad); codebooks:
    (S, K, dsub).

    d(q, x̃) = |q|² − 2(q·c_p + q·r̃) + |x̃|²   (l2; dot analogous)

    On TPU the per-probe LUT sum q·r̃ = Σ_s dlut[q, s, code_s] runs in
    the fused Pallas kernel (no gathered codes or one-hot in HBM); the
    XLA fallback uses a per-probe-step one-hot einsum.
    """
    qb = q.shape[0]
    nparts, s_pad, pmax = codes.shape
    kcode = codebooks.shape[1]
    qf = q.astype(jnp.float32)
    probe_ids, probe_dots = _select_probes(q, centroids, nprobes, metric)
    # OPQ: codes quantize ROTATED residuals ŷ, and q·(Rᵀŷ) = (R·q)·ŷ,
    # so the LUT is built from the rotated query
    q_lut = qf if rotation is None else jnp.dot(
        qf, rotation.T, precision=jax.lax.Precision.HIGHEST)
    dlut = _pq_dlut(q_lut, codebooks, s_pad)  # (Q, S_pad, K)
    qn2 = jnp.sum(jnp.square(qf), axis=-1)  # (Q,)
    if metric == "dot":
        # kernel form qn2 − 2(qc + qdotr) + rn → with qn2=0 and rn =
        # padding penalty only, halving yields −(q·x̃) + penalty
        qn2 = jnp.zeros_like(qn2)
        rn = jnp.where(rnorms >= PAD_PENALTY, PAD_PENALTY, 0.0)
    else:
        rn = rnorms
    if has_mask:
        rn = rn + slot_penalty.reshape(nparts, pmax)

    # Kernel choice is codebook-size dependent (measured, v5e, SIFT1M
    # shapes, scripts/probe_pq8.py): K=16 (4-bit) the XLA one-hot einsum
    # rides the MXU at 16.7k qps vs 8.9-11.6k for the fused kernels;
    # K=256 (8-bit) the Pallas lane-gather kernel does 17.6k qps vs 756
    # for the XLA einsum (the (Q,S,pmax,256) one-hot transient thrashes
    # HBM). Route: Pallas only when the codebook outgrows the MXU sweep.
    # the fused ADC kernel needs lane/sublane-aligned layouts
    pallas_ok = pmax % 128 == 0 and s_pad % 8 == 0
    if use_pallas and kcode > 64 and pallas_ok:
        dists = ivf_pq_adc_scan_pallas(probe_ids, dlut, codes, rn, probe_dots, qn2)
    else:
        dlut_b = dlut.astype(matmul_dtype())

        def probe_step(j):
            pid = probe_ids[:, j]  # (Q,)
            codes_j = jnp.take(codes, pid, axis=0)  # (Q, S_pad, pmax)
            rn_j = jnp.take(rn, pid, axis=0)  # (Q, pmax)
            oh = jax.nn.one_hot(codes_j.astype(jnp.int32), kcode, dtype=matmul_dtype(), axis=-1)
            qdotr = jnp.einsum(
                "qspk,qsk->qp", oh, dlut_b, preferred_element_type=jnp.float32
            )
            return qn2[:, None] - 2.0 * (probe_dots[:, j][:, None] + qdotr) + rn_j

        dists = jax.lax.map(probe_step, jnp.arange(nprobes)).transpose(1, 0, 2)

    if metric == "dot":
        dists = dists * 0.5
    flat = dists.reshape(qb, nprobes * pmax)
    k_sel = min(k, nprobes * pmax)
    if exact_sel:
        vals, pos = topk_smallest(flat, k_sel)
    else:
        vals, pos = approx_topk_smallest(flat, k_sel)
    probe_of = pos // pmax
    off = pos % pmax
    slots = jnp.take_along_axis(probe_ids, probe_of, axis=1) * pmax + off
    if k_sel < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - k_sel)), constant_values=PAD_PENALTY)
        slots = jnp.pad(slots, ((0, 0), (0, k - k_sel)))
    return vals, slots


def _chunked_probe_topk(
    probe_ids, score_chunk, qb: int, pmax: int, nprobes: int, k: int,
    bytes_per_slot: int,
):
    """Shared skeleton for probed scans: chunk probes via lax.map so the
    gathered transient stays under ~1 GB, mask padded probe slots, then
    top-k and map positions to global slot ids."""
    budget_elems = (1 << 30) // max(1, bytes_per_slot)
    chunk = max(1, min(nprobes, budget_elems // max(1, qb * pmax)))
    n_chunks = -(-nprobes // chunk)
    pad_probes = n_chunks * chunk - nprobes
    pids_c = jnp.pad(probe_ids, ((0, 0), (0, pad_probes))).reshape(qb, n_chunks, chunk)

    if n_chunks == 1:
        d = score_chunk(pids_c[:, 0], 0)
    else:
        d = jax.lax.map(
            lambda args: score_chunk(args[0], args[1]),
            (pids_c.transpose(1, 0, 2), jnp.arange(n_chunks)),
        )  # (nc, Q, chunk, pmax)
        d = d.transpose(1, 0, 2, 3).reshape(qb, n_chunks * chunk, pmax)
    d = d.reshape(qb, -1)
    if pad_probes:
        probe_valid = jnp.arange(n_chunks * chunk) < nprobes
        d = jnp.where(jnp.repeat(probe_valid, pmax)[None, :], d, PAD_PENALTY)
    vals, pos = topk_smallest(d, k)
    flat_pids = pids_c.reshape(qb, -1)
    slots = jnp.take_along_axis(flat_pids, pos // pmax, axis=1) * pmax + pos % pmax
    return vals, slots


def _masked_chunked_topk(probe_ids, score_chunk, nprobes_rt, qb: int, pmax: int,
                         k: int, chunk: int):
    """Runtime-nprobes twin of ``_chunked_probe_topk``.

    ONE compiled program per index layout serves every nprobes ≤ np_max
    (= probe_ids.shape[1]): the probe list is scanned in fixed-size
    chunks under ``lax.scan``, each iteration guarded by a ``lax.cond``
    on the RUNTIME probe budget — skipped chunks cost only the loop
    overhead, so work stays proportional to the requested nprobes while
    nprobes itself is a device scalar, not a compile-time constant
    (SURVEY §7 "recompile-free nprobes via masking"; the reference
    treats min/max nprobes as runtime knobs, query.rs:1215-1283).
    Probes past the budget inside the last live chunk are masked with
    an additive +inf penalty. A running top-k carry merges chunk
    results, so the transient never exceeds (Q, chunk, pmax)."""
    np_max = probe_ids.shape[1]
    n_chunks = -(-np_max // chunk)
    pad = n_chunks * chunk - np_max
    pids = jnp.pad(probe_ids, ((0, 0), (0, pad)))
    probe_pen = jnp.where(
        jnp.arange(n_chunks * chunk) < nprobes_rt, 0.0, PAD_PENALTY
    ).astype(jnp.float32)
    k_sel = min(k, chunk * pmax)

    if n_chunks == 1:
        # bucketed single-shot path (the TPU serving shape): no scan or
        # cond wrapper — the program is the static kernel plus one
        # additive probe mask, so compile cost and throughput match the
        # static-nprobes program
        d = score_chunk(pids, 0) + probe_pen[None, :, None]
        v, p = topk_smallest(d.reshape(qb, chunk * pmax), k_sel)
        s = jnp.take_along_axis(pids, p // pmax, axis=1) * pmax + p % pmax
        if k_sel < k:
            v = jnp.pad(v, ((0, 0), (0, k - k_sel)), constant_values=np.inf)
            s = jnp.pad(s, ((0, 0), (0, k - k_sel)))
        return v, s

    def live(carry, ci):
        bv, bs = carry
        pid = jax.lax.dynamic_slice(pids, (0, ci * chunk), (qb, chunk))
        d = score_chunk(pid, ci)  # (qb, chunk, pmax)
        d = d + jax.lax.dynamic_slice(probe_pen, (ci * chunk,), (chunk,))[None, :, None]
        v, p = topk_smallest(d.reshape(qb, chunk * pmax), k_sel)
        s = jnp.take_along_axis(pid, p // pmax, axis=1) * pmax + p % pmax
        mv, mp = topk_smallest(jnp.concatenate([bv, v], axis=1), k_sel)
        return mv, jnp.take_along_axis(jnp.concatenate([bs, s], axis=1), mp, axis=1)

    def body(carry, ci):
        return jax.lax.cond(
            ci * chunk < nprobes_rt, live, lambda c, _ci: c, carry, ci
        ), None

    init = (
        jnp.full((qb, k_sel), jnp.inf, jnp.float32),
        jnp.zeros((qb, k_sel), jnp.int32),
    )
    (bv, bs), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    if k_sel < k:
        bv = jnp.pad(bv, ((0, 0), (0, k - k_sel)), constant_values=np.inf)
        bs = jnp.pad(bs, ((0, 0), (0, k - k_sel)))
    return bv, bs


def _np_max_bucket(npb: int, nparts: int) -> int:
    """Static probe capacity for the runtime-nprobes programs.

    Power-of-two buckets from 16: nprobes is a runtime mask WITHIN a
    bucket (zero recompiles for any setting inside it), and at most
    ~log2(nparts/16) programs exist per index layout ever — the
    per-value compile explosion (863 s at one sweep point in round 3)
    is structurally gone. Buckets rather than one 128-probe program
    because the fused Pallas scan's cost follows the STATIC probe
    capacity; measured on v5e (1M x 128, batch 128) a single 128-probe
    masked program served nprobes=8 at 2.9x the cost of the 16-bucket
    program."""
    m = 16
    while m < npb:
        m *= 2
    return min(nparts, m)


@partial(jax.jit, static_argnames=("k", "np_max", "metric", "has_mask", "use_pallas"))
def _ivf_flat_search_device_rt(
    q, centroids, vectors, norms2, slot_penalty, nprobes,
    k: int, np_max: int, metric: str, has_mask: bool, use_pallas: bool = False,
):
    """Runtime-nprobes IVF_FLAT probed scan (see _masked_chunked_topk).

    ``nprobes`` is a device int32 scalar ≤ np_max (static). Kernel
    bodies are shared with the static path: the fused Pallas grouped
    scan per chunk on TPU, a chunked gather+einsum fallback elsewhere."""
    qb, dim = q.shape
    nparts, pmax, _ = vectors.shape
    probe_ids, _ = _select_probes(q, centroids, np_max, metric)
    qf = q.astype(jnp.float32)
    if use_pallas and not (dim % 128 == 0 and pmax % 8 == 0):
        use_pallas = False

    if use_pallas:
        if metric == "l2":
            alpha = jnp.full((qb,), -2.0, jnp.float32)
            gamma = jnp.sum(jnp.square(qf), axis=-1)
            norms_in = norms2
        else:
            pad_pen = jnp.where(norms2 >= PAD_PENALTY, PAD_PENALTY, 0.0)
            if metric == "cosine":
                qn = jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(qf), axis=-1)), 1e-30)
                alpha = -1.0 / qn
                gamma = jnp.ones((qb,), jnp.float32)
            else:  # dot
                alpha = jnp.full((qb,), -1.0, jnp.float32)
                gamma = jnp.zeros((qb,), jnp.float32)
            norms_in = pad_pen
        if has_mask:
            norms_in = norms_in + slot_penalty.reshape(norms2.shape)

        def score_chunk(pid, ci):
            return ivf_flat_grouped_scan_pallas(pid, qf, vectors, norms_in, alpha, gamma)

        # ONE fused kernel call over the whole bucket: the grouped scan
        # amortizes partition DMAs across every (query, probe) pair, so
        # chunking it loses ~2x (measured r4); probes past the runtime
        # budget are penalty-masked inside _masked_chunked_topk
        chunk = np_max
        return _masked_chunked_topk(probe_ids, score_chunk, nprobes, qb, pmax, k, chunk)

    scan_f32 = vectors.dtype == jnp.float32
    qs = qf if scan_f32 else qf.astype(matmul_dtype())
    qn = jnp.sqrt(jnp.sum(jnp.square(qf), axis=-1))[:, None, None]
    qn2 = jnp.sum(jnp.square(qf), axis=-1)[:, None, None]

    def score_chunk(pid, ci):
        g_vecs = jnp.take(vectors, pid, axis=0)  # (Q, c, pmax, D)
        g_norm = jnp.take(norms2, pid, axis=0)
        dots = jnp.einsum(
            "qnpd,qd->qnp",
            g_vecs if scan_f32 else g_vecs.astype(matmul_dtype()),
            qs,
            precision=jax.lax.Precision.HIGHEST if scan_f32 else None,
            preferred_element_type=jnp.float32,
        )
        if metric == "dot":
            d = -dots + jnp.where(g_norm >= PAD_PENALTY, PAD_PENALTY, 0.0)
        elif metric == "cosine":
            d = 1.0 - dots / jnp.maximum(qn, 1e-30)
            d = d + jnp.where(g_norm >= PAD_PENALTY, PAD_PENALTY, 0.0)
        else:
            d = qn2 - 2.0 * dots + g_norm
        if has_mask:
            d = d + jnp.take(slot_penalty.reshape(nparts, pmax), pid, axis=0)
        return d

    # chunk stays small so the runtime probe budget actually skips
    # work (a chunk >= np_max would always scan every probe) and the
    # gathered transient stays bounded
    chunk = max(1, min(np_max, 8, (1 << 28) // max(1, qb * pmax * dim)))
    return _masked_chunked_topk(probe_ids, score_chunk, nprobes, qb, pmax, k, chunk)


@partial(jax.jit, static_argnames=("k", "np_max", "metric", "has_mask", "use_pallas"))
def _ivf_pq_search_device_rt(
    q, centroids, codes, rnorms, codebooks, slot_penalty, nprobes,
    k: int, np_max: int, metric: str, has_mask: bool,
    use_pallas: bool = False, rotation=None,
):
    """Runtime-nprobes IVF_PQ ADC scan (see _masked_chunked_topk).
    Distance math matches _ivf_pq_search_device; selection is exact
    per-chunk top-k (chunk·pmax candidates — small enough that the
    approx partial-reduce buys nothing)."""
    qb = q.shape[0]
    nparts, s_pad, pmax = codes.shape
    kcode = codebooks.shape[1]
    qf = q.astype(jnp.float32)
    probe_ids, probe_dots = _select_probes(q, centroids, np_max, metric)
    q_lut = qf if rotation is None else jnp.dot(
        qf, rotation.T, precision=jax.lax.Precision.HIGHEST)
    dlut = _pq_dlut(q_lut, codebooks, s_pad)  # (Q, S_pad, K)
    qn2 = jnp.sum(jnp.square(qf), axis=-1)  # (Q,)
    if metric == "dot":
        qn2 = jnp.zeros_like(qn2)
        rn = jnp.where(rnorms >= PAD_PENALTY, PAD_PENALTY, 0.0)
    else:
        rn = rnorms
    if has_mask:
        rn = rn + slot_penalty.reshape(nparts, pmax)

    pallas_ok = pmax % 128 == 0 and s_pad % 8 == 0
    pd_padded = jnp.pad(probe_dots, ((0, 0), (0, np_max)))

    if use_pallas and kcode > 64 and pallas_ok:
        # one fused ADC call over the bucket (see the IVF_FLAT comment)
        chunk = np_max

        def score_chunk(pid, ci):
            pd = jax.lax.dynamic_slice(pd_padded, (0, ci * chunk), (qb, chunk))
            return ivf_pq_adc_scan_pallas(pid, dlut, codes, rn, pd, qn2)
    else:
        dlut_b = dlut.astype(matmul_dtype())
        # one-hot transient is (Q, c, S_pad, pmax, K) in bf16
        budget = (1 << 29) // max(1, qb * s_pad * pmax * kcode)
        chunk = max(1, min(np_max, 8, budget))

        def score_chunk(pid, ci):
            pd = jax.lax.dynamic_slice(pd_padded, (0, ci * chunk), (qb, chunk))
            codes_j = jnp.take(codes, pid, axis=0)  # (Q, c, S_pad, pmax)
            rn_j = jnp.take(rn, pid, axis=0)  # (Q, c, pmax)
            oh = jax.nn.one_hot(
                codes_j.astype(jnp.int32), kcode, dtype=matmul_dtype(), axis=-1
            )
            qdotr = jnp.einsum(
                "qcspk,qsk->qcp", oh, dlut_b, preferred_element_type=jnp.float32
            )
            return qn2[:, None, None] - 2.0 * (pd[:, :, None] + qdotr) + rn_j

    vals, slots = _masked_chunked_topk(probe_ids, score_chunk, nprobes, qb, pmax, k, chunk)
    if metric == "dot":
        vals = jnp.where(vals < PAD_PENALTY / 2, vals * 0.5, vals)
    return vals, slots


@partial(jax.jit, static_argnames=("k", "np_max", "metric", "has_mask"))
def _ivf_rq_search_device_rt(
    q, centroids, bits, scales, rnorms, rotation, slot_penalty, nprobes,
    k: int, np_max: int, metric: str, has_mask: bool,
):
    """Runtime-nprobes IVF_RQ scan (math matches _ivf_rq_search_device)."""
    qb = q.shape[0]
    nparts, pmax, _ = bits.shape
    dim = rotation.shape[0]
    qf = q.astype(jnp.float32)
    probe_ids, probe_dots = _select_probes(q, centroids, np_max, metric)
    q_rot = jnp.dot(qf, rotation.T, precision=jax.lax.Precision.HIGHEST)
    q_rot_b = q_rot.astype(matmul_dtype())
    qn2 = jnp.sum(jnp.square(qf), axis=-1)[:, None, None]
    shifts = jnp.arange(8, dtype=jnp.uint8)
    chunk = max(1, min(np_max, 8, ((1 << 30) // (2 * dim)) // max(1, qb * pmax)))
    pd_padded = jnp.pad(probe_dots, ((0, 0), (0, np_max)))

    def score_chunk(pid, ci):
        g_bits = jnp.take(bits, pid, axis=0)
        g_scale = jnp.take(scales, pid, axis=0)
        g_rn = jnp.take(rnorms, pid, axis=0)
        pm1 = ((g_bits[..., None] >> shifts) & jnp.uint8(1)).astype(matmul_dtype()) * 2.0 - 1.0
        pm1 = pm1.reshape(*g_bits.shape[:-1], -1)
        dots_r = jnp.einsum(
            "qnpd,qd->qnp", pm1, q_rot_b, preferred_element_type=jnp.float32
        )
        pd = jax.lax.dynamic_slice(pd_padded, (0, ci * chunk), (qb, chunk))
        qdotx = pd[:, :, None] + g_scale * dots_r
        if metric == "dot":
            d = -qdotx + jnp.where(g_rn >= PAD_PENALTY, PAD_PENALTY, 0.0)
        else:
            d = qn2 - 2.0 * qdotx + g_rn
        if has_mask:
            d = d + jnp.take(slot_penalty.reshape(nparts, pmax), pid, axis=0)
        return d

    return _masked_chunked_topk(probe_ids, score_chunk, nprobes, qb, pmax, k, chunk)


@partial(jax.jit, static_argnames=("k", "np_max", "metric", "has_mask"))
def _ivf_sq_search_device_rt(
    q, centroids, codes, norms2, scale, offset, slot_penalty, nprobes,
    k: int, np_max: int, metric: str, has_mask: bool,
):
    """Runtime-nprobes IVF_SQ scan (math matches _ivf_sq_search_device)."""
    qb = q.shape[0]
    nparts, pmax, dim = codes.shape
    qf = q.astype(jnp.float32)
    probe_ids, _ = _select_probes(q, centroids, np_max, metric)
    q_scaled = (qf * scale[None, :]).astype(matmul_dtype())
    q_off = jnp.dot(qf, offset)[:, None, None]
    qn2 = jnp.sum(jnp.square(qf), axis=-1)[:, None, None]
    chunk = max(1, min(np_max, 8, ((1 << 30) // (3 * dim)) // max(1, qb * pmax)))

    def score_chunk(pid, ci):
        g_codes = jnp.take(codes, pid, axis=0)
        g_norm = jnp.take(norms2, pid, axis=0)
        dots = jnp.einsum(
            "qnpd,qd->qnp", g_codes.astype(matmul_dtype()), q_scaled,
            preferred_element_type=jnp.float32,
        ) + q_off
        if metric == "dot":
            d = -dots + jnp.where(g_norm >= PAD_PENALTY, PAD_PENALTY, 0.0)
        else:
            d = qn2 - 2.0 * dots + g_norm
        if has_mask:
            d = d + jnp.take(slot_penalty.reshape(nparts, pmax), pid, axis=0)
        return d

    return _masked_chunked_topk(probe_ids, score_chunk, nprobes, qb, pmax, k, chunk)


@partial(jax.jit, static_argnames=("k", "nprobes", "metric", "has_mask"))
def _ivf_rq_search_device(
    q, centroids, bits, scales, rnorms, rotation, slot_penalty,
    k: int, nprobes: int, metric: str, has_mask: bool,
):
    """1-bit residual scan: q·r̂ = s · (Rq)·sign_bits, a ±1 matvec.

    bits: (P, pmax, D/8) uint8 packed little-endian; scales: (P, pmax);
    rnorms: (P, pmax) = |x̂|² (+inf pad); rotation: (D, D). The unpack
    to ±1 inflates bits 16×, so probes gather in chunks.
    """
    qb = q.shape[0]
    nparts, pmax, _ = bits.shape
    dim = rotation.shape[0]
    qf = q.astype(jnp.float32)
    probe_ids, probe_dots = _select_probes(q, centroids, nprobes, metric)
    q_rot = jnp.dot(qf, rotation.T, precision=jax.lax.Precision.HIGHEST)  # (Q, D)
    q_rot_b = q_rot.astype(matmul_dtype())
    qn2 = jnp.sum(jnp.square(qf), axis=-1)[:, None, None]
    shifts = jnp.arange(8, dtype=jnp.uint8)

    def score_chunk(pid, ci):  # pid (Q, c); ci chunk index into probe_dots
        g_bits = jnp.take(bits, pid, axis=0)  # (Q, c, pmax, D/8)
        g_scale = jnp.take(scales, pid, axis=0)
        g_rn = jnp.take(rnorms, pid, axis=0)
        # unpack to ±1 (little-endian, matches np.packbits bitorder)
        pm1 = ((g_bits[..., None] >> shifts) & jnp.uint8(1)).astype(matmul_dtype()) * 2.0 - 1.0
        pm1 = pm1.reshape(*g_bits.shape[:-1], -1)  # (Q, c, pmax, D)
        dots_r = jnp.einsum(
            "qnpd,qd->qnp", pm1, q_rot_b, preferred_element_type=jnp.float32
        )
        c = pid.shape[1]
        pd = jax.lax.dynamic_slice(
            jnp.pad(probe_dots, ((0, 0), (0, c))), (0, ci * c), (qb, c)
        )
        qdotx = pd[:, :, None] + g_scale * dots_r
        if metric == "dot":
            d = -qdotx + jnp.where(g_rn >= PAD_PENALTY, PAD_PENALTY, 0.0)
        else:
            d = qn2 - 2.0 * qdotx + g_rn
        if has_mask:
            d = d + jnp.take(slot_penalty.reshape(nparts, pmax), pid, axis=0)
        return d

    return _chunked_probe_topk(
        probe_ids, score_chunk, qb, pmax, nprobes, k, bytes_per_slot=2 * dim
    )


@partial(jax.jit, static_argnames=("k", "nprobes", "metric", "has_mask"))
def _ivf_sq_search_device(
    q, centroids, codes, norms2, scale, offset, slot_penalty,
    k: int, nprobes: int, metric: str, has_mask: bool,
):
    """SQ scan: dequantize-on-the-fly matvec over probed blocks.

    q·x̃ = (q*scale)·codes + q·offset — codes stay uint8 in HBM, cast
    to bf16 in registers; probes gather in chunks.
    """
    qb = q.shape[0]
    nparts, pmax, dim = codes.shape
    qf = q.astype(jnp.float32)
    probe_ids, _ = _select_probes(q, centroids, nprobes, metric)
    q_scaled = (qf * scale[None, :]).astype(matmul_dtype())
    q_off = jnp.dot(qf, offset)[:, None, None]
    qn2 = jnp.sum(jnp.square(qf), axis=-1)[:, None, None]

    def score_chunk(pid, ci):
        g_codes = jnp.take(codes, pid, axis=0)  # (Q, c, pmax, D) uint8
        g_norm = jnp.take(norms2, pid, axis=0)
        dots = jnp.einsum(
            "qnpd,qd->qnp", g_codes.astype(matmul_dtype()), q_scaled,
            preferred_element_type=jnp.float32,
        ) + q_off
        if metric == "dot":
            d = -dots + jnp.where(g_norm >= PAD_PENALTY, PAD_PENALTY, 0.0)
        else:
            d = qn2 - 2.0 * dots + g_norm
        if has_mask:
            d = d + jnp.take(slot_penalty.reshape(nparts, pmax), pid, axis=0)
        return d

    return _chunked_probe_topk(
        probe_ids, score_chunk, qb, pmax, nprobes, k, bytes_per_slot=3 * dim
    )


class VectorSearcher:
    """Loaded, device-resident index ready to serve queries."""

    def __init__(self, store: ObjectStore, prefix: str, meta: IndexMeta):
        self.meta = meta
        self.params = json.loads(store.read_bytes(f"{prefix}/meta.json"))
        self.metric = self.params["metric"]
        self.index_type = self.params["index_type"]
        self.dim = self.params["dim"]
        self._store = store
        self._prefix = prefix
        self._device: dict[str, jax.Array] = {}
        self._load(store, prefix)

    # ---- loading -------------------------------------------------------
    def _load(self, store, prefix):
        if self.index_type == "FLAT":
            vecs = np.asarray(_load_npy(store, f"{prefix}/vectors.npy"))
            rids = np.asarray(_load_npy(store, f"{prefix}/row_ids.npy")).astype(np.uint64)
            n = vecs.shape[0]
            n_pad = round_up(n, 8)
            penalty = np.zeros(n_pad, np.float32)
            penalty[n:] = PAD_PENALTY
            if n_pad != n:
                vecs = np.pad(vecs, ((0, n_pad - n), (0, 0)))
                rids = np.pad(rids, (0, n_pad - n), constant_values=np.iinfo(np.uint64).max)
            self.row_ids_flat = rids
            norms2 = np.sum(vecs.astype(np.float64) ** 2, axis=1).astype(np.float32)
            self._device["vectors"] = jnp.asarray(vecs)
            self._device["norms2"] = jnp.asarray(norms2)
            self._device["penalty"] = jnp.asarray(penalty)
            self.num_slots = n_pad
            return
        self.nparts = self.params["num_partitions"]
        self.pmax = self.params["pmax"]
        rid = np.asarray(_load_npy(store, f"{prefix}/row_ids.npy"))  # (P, pmax) int64
        self.row_ids_flat = rid.reshape(-1).view(np.uint64)
        self.row_ids_valid = rid.reshape(-1) >= 0
        self.num_slots = self.nparts * self.pmax
        self._device["centroids"] = jnp.asarray(
            np.asarray(_load_npy(store, f"{prefix}/centroids.npy"))
        )
        if self.index_type == "IVF_FLAT":
            vecs = np.asarray(_load_npy(store, f"{prefix}/vectors.npy"))
            norms2 = np.sum(vecs.astype(np.float64) ** 2, axis=2).astype(np.float32)
            norms2[~self.row_ids_valid.reshape(self.nparts, self.pmax)] = PAD_PENALTY
            # storage dtype per build config: f32 ranks exactly; bf16
            # halves HBM + gather traffic at ~1-2% recall cost (the f32
            # norms keep the l2 expansion accurate either way)
            dtype = (
                matmul_dtype()
                if self.params.get("precision") == "bfloat16"
                else jnp.float32
            )
            self._device["vectors"] = jnp.asarray(vecs, dtype=dtype)
            self._device["norms2"] = jnp.asarray(norms2)
        elif self.index_type == "IVF_SQ":
            self._device["codes"] = jnp.asarray(np.asarray(_load_npy(store, f"{prefix}/codes.npy")))
            self._device["norms2"] = jnp.asarray(np.asarray(_load_npy(store, f"{prefix}/norms.npy")))
            self._device["scale"] = jnp.asarray(np.asarray(_load_npy(store, f"{prefix}/sq_scale.npy")))
            self._device["offset"] = jnp.asarray(
                np.asarray(_load_npy(store, f"{prefix}/sq_offset.npy"))
            )
        elif self.index_type == "IVF_PQ":
            self._device["codes"] = jnp.asarray(np.asarray(_load_npy(store, f"{prefix}/codes.npy")))
            self._device["rnorms"] = jnp.asarray(np.asarray(_load_npy(store, f"{prefix}/rnorms.npy")))
            self._device["codebooks"] = jnp.asarray(
                np.asarray(_load_npy(store, f"{prefix}/codebooks.npy"))
            )
            if self.params.get("opq"):
                self._device["rotation"] = jnp.asarray(
                    np.asarray(_load_npy(store, f"{prefix}/rotation.npy"))
                )
        elif self.index_type == "IVF_RQ":
            self._device["bits"] = jnp.asarray(np.asarray(_load_npy(store, f"{prefix}/bits.npy")))
            self._device["scales"] = jnp.asarray(np.asarray(_load_npy(store, f"{prefix}/scales.npy")))
            self._device["rnorms"] = jnp.asarray(np.asarray(_load_npy(store, f"{prefix}/rnorms.npy")))
            self._device["rotation"] = jnp.asarray(
                np.asarray(_load_npy(store, f"{prefix}/rotation.npy"))
            )
        else:
            raise InvalidInputError(f"cannot load index type {self.index_type!r}")

    # ---- mask plumbing -------------------------------------------------
    def slot_penalty(
        self,
        allowed_row_ids: np.ndarray | None,
        deleted_row_ids: np.ndarray | None,
        vanished_fragments: set[int] | None = None,
    ):
        """Build the per-slot additive penalty for prefilter/deletions.

        allowed_row_ids: sorted uint64 array (None = all allowed).
        deleted_row_ids: sorted uint64 array (None = none deleted).
        vanished_fragments: fragment ids no longer in the manifest whose
        indexed rows must all be masked.
        """
        no_deleted = deleted_row_ids is None or not len(deleted_row_ids)
        if allowed_row_ids is None and no_deleted and not vanished_fragments:
            return None
        penalty = np.zeros(self.num_slots, dtype=np.float32)
        rid = self.row_ids_flat
        if allowed_row_ids is not None:
            ok = np.isin(rid, allowed_row_ids)
            penalty[~ok] = PAD_PENALTY
        if not no_deleted:
            penalty[np.isin(rid, deleted_row_ids)] = PAD_PENALTY
        if vanished_fragments:
            frag_of = (rid >> np.uint64(32)).astype(np.int64)
            dead = np.isin(frag_of, np.fromiter(vanished_fragments, dtype=np.int64))
            penalty[dead] = PAD_PENALTY
        return penalty

    @property
    def device_refine_active(self) -> bool:
        """True once prepare_device_refine has a resident refine table —
        search(refine_factor=rf) then returns already-refined results
        and the host refine pass must be skipped."""
        return "refine_vecs" in self._device

    @staticmethod
    def refine_column_slots(dataset, column: str, metric: str, slot_row_ids):
        """Materialize ``column`` with row ids and map index slots to row
        positions: returns (mat, pos, found) where ``mat`` is the
        rowid-sorted f32 matrix (unit-norm for cosine), ``pos[i]`` the
        row of ``slot_row_ids[i]`` in ``mat`` and ``found[i]`` whether
        that row id still exists. Shared by the single-device and
        mesh-sharded fused-refine preparers."""
        tbl = dataset.to_table(columns=[column], with_row_id=True)
        rid = tbl.column("_rowid").to_numpy().astype(np.uint64)
        mat = fsl_to_numpy(tbl.column(column)).astype(np.float32)
        order = np.argsort(rid)
        rid, mat = rid[order], mat[order]
        if metric == "cosine":
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        slot_row_ids = np.asarray(slot_row_ids, dtype=np.uint64)
        pos = np.searchsorted(rid, slot_row_ids)
        pos = np.clip(pos, 0, max(0, len(rid) - 1)).astype(np.int64)
        if len(rid):
            found = rid[pos] == slot_row_ids
        else:
            found = np.zeros_like(pos, bool)
        return mat, pos, found

    def will_fuse_refine(self, params: SearchParams) -> bool:
        """Whether search(params) will return already-refined results.
        The query layer consults this to decide if the host refine pass
        is needed — a precision='float32' request only fuses against an
        f32 resident table (never silently against bf16)."""
        return (
            params.refine_factor is not None
            and self.device_refine_active
            and self.index_type in ("IVF_PQ", "IVF_SQ", "IVF_RQ")
            and (
                params.precision != "float32"
                or self._device["refine_vecs"].dtype == jnp.float32
            )
        )

    def prepare_device_refine(
        self, dataset, column: str, precision: str | None = None
    ) -> bool:
        """Upload a device-resident copy of the original vectors for the
        fused refine rerank (_device_refine_step); exact f32 norms keep
        the l2 expansion accurate regardless of the storage dtype.

        Returns False (and stays on the host refine path) for
        non-quantized indexes, when LANCEDB_TPU_DEVICE_REFINE=0, or when
        the table would exceed LANCEDB_TPU_DEVICE_REFINE_BUDGET bytes
        (default 6e9). Rows deleted after the index build map to row 0 —
        harmless, their slots are +inf-penalized before refine.

        Precision policy (VERDICT r3 #3: bf16 storage cost ~2 recall
        points vs the host f32 refine): default 'auto' stores f32 when
        the table fits LANCEDB_TPU_DEVICE_REFINE_F32_BUDGET bytes
        (default 2e9 — exact rerank, recall == host refine) and f16
        above it (halves HBM and the upload). The sub-f32 table holds
        RESIDUALS against each slot's IVF block centroid rather than
        raw vectors: x = c_block + r with only r rounded, and ‖r‖ runs
        2–5x below ‖x‖ on clustered data, so the f16 rounding error on
        the reconstructed dot shrinks by the same factor — this is what
        closes the large-D (960/1536) fused-vs-host recall gap without
        spending f32 bytes. The centroids are already device-resident
        f32 and a candidate's block is just slot // pmax, so the refine
        step reconstructs in-jit at no extra HBM. Explicit 'float32' /
        'float16' / 'bfloat16' override."""
        if self.device_refine_active:
            return True
        if getattr(self, "_refine_unavailable", False):
            return False  # memoized: don't re-scan the column per query
        if os.environ.get("LANCEDB_TPU_DEVICE_REFINE", "1") == "0":
            return False
        if self.index_type not in ("IVF_PQ", "IVF_SQ", "IVF_RQ"):
            self._refine_unavailable = True
            return False
        n_live = dataset.count_rows() if hasattr(dataset, "count_rows") else None
        budget = float(os.environ.get("LANCEDB_TPU_DEVICE_REFINE_BUDGET", 6e9))
        if precision in (None, "auto"):
            f32_budget = float(
                os.environ.get("LANCEDB_TPU_DEVICE_REFINE_F32_BUDGET", 2e9)
            )
            n_est = n_live if n_live is not None else len(self.row_ids_flat)
            precision = "float32" if n_est * self.dim * 4 <= f32_budget else "float16"
        dtype = {
            "float32": jnp.float32,
            "float16": jnp.float16,
            "bfloat16": matmul_dtype(),
        }.get(precision, jnp.float16)
        bytes_per = 4 if dtype == jnp.float32 else 2
        if n_live is not None and n_live * self.dim * bytes_per > budget:
            self._refine_unavailable = True
            return False
        mat, pos, found = self.refine_column_slots(
            dataset, column, self.metric, self.row_ids_flat
        )
        if mat.shape[0] * mat.shape[1] * bytes_per > budget:
            self._refine_unavailable = True
            return False
        slotmap = np.where(found & self.row_ids_valid, pos, 0).astype(np.int32)
        if mat.shape[0] == 0:
            return False
        self._refine_residual = False
        if dtype != jnp.float32:
            # residual storage (see docstring): rows keep their owning
            # slot's block centroid implicit; reconstruct in-jit
            cents = np.asarray(self._device["centroids"], dtype=np.float32)
            part_of_slot = (
                np.arange(self.num_slots, dtype=np.int64) // self.pmax
            ).astype(np.int32)
            valid = found & self.row_ids_valid
            part_of_row = np.zeros(mat.shape[0], np.int32)
            part_of_row[pos[valid]] = part_of_slot[valid]
            mat = mat - cents[part_of_row]
            self._refine_residual = True
        self._device["refine_slotmap"] = jnp.asarray(slotmap)
        self._device["refine_vecs"] = jnp.asarray(mat, dtype=dtype)
        if self.metric not in ("dot", "cosine"):
            # exact f32 norms of the ORIGINAL rows (residual storage
            # never touches them): recompute pre-subtraction values
            orig = mat + cents[part_of_row] if self._refine_residual else mat
            self._device["refine_norms2"] = jnp.asarray(
                np.sum(orig.astype(np.float64) ** 2, axis=1).astype(np.float32)
            )
        return True

    def _vectors_lp(self) -> jax.Array:
        """Device-resident low-precision copy of the FLAT table for the
        coarse scan (created on first bf16-mode search; +2 B/element of
        HBM buys halved scan traffic vs casting f32 in-jit)."""
        lp = self._device.get("vectors_lp")
        if lp is None:
            lp = self._device["vectors"].astype(matmul_dtype())
            self._device["vectors_lp"] = lp
        return lp

    # ---- search --------------------------------------------------------
    def search(
        self,
        queries: np.ndarray,
        params: SearchParams,
        slot_penalty: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (distances (Q, k), row_ids (Q, k) uint64). Slots that
        fell off the index (padding / filtered) come back with distance
        +inf and row id 2^64-1."""
        q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        if q.shape[1] != self.dim:
            raise InvalidInputError(f"query dim {q.shape[1]} != index dim {self.dim}")
        if self.metric == "cosine":
            q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        nq = q.shape[0]
        if nq > _Q_CHUNK:
            # chunk large batches to bound the probed-gather transient
            parts = [
                self.search(q[i : i + _Q_CHUNK], params, slot_penalty)
                for i in range(0, nq, _Q_CHUNK)
            ]
            return (
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
            )
        qb = _q_bucket(nq)
        if qb != nq:
            q = np.pad(q, ((0, qb - nq), (0, 0)))
        k_eff = params.k if params.refine_factor is None else params.k * params.refine_factor
        k_eff = min(k_eff, self.num_slots)
        qj = jnp.asarray(q)
        has_mask = slot_penalty is not None
        # the no-mask penalty and empty norms are per-searcher constants:
        # allocating them per query costs one eager dispatch each (a full
        # tunnel RTT on hardware for single-query serving)
        zero = self._device.get("zero_pen")
        if zero is None:
            zero = self._device["zero_pen"] = jnp.zeros((1,), jnp.float32)
        pen = jnp.asarray(slot_penalty) if has_mask else zero

        if self.index_type == "FLAT":
            mode = params.precision
            if mode == "default" and params.approx_mode == "accurate":
                mode = "float32"
            vals, slots = _flat_search_device(
                qj,
                self._device["vectors"],
                self._device["vectors"] if mode == "float32" else self._vectors_lp(),
                self._device["norms2"],
                (self._device["penalty"] + pen) if has_mask
                else self._device["penalty"],
                k=k_eff,
                metric=self.metric,
                mode=mode,
            )
        else:
            # nprobes is block-granular: fat logical partitions were split
            # into duplicate-centroid blocks at build (_balanced_layout),
            # so rescale the user's per-partition nprobes to blocks
            logical = self.params.get("num_logical_partitions", self.nparts)
            scale = self.nparts / max(1, logical)
            nprobes = min(self.nparts, max(1, int(np.ceil(params.nprobes * scale))))
            # recompile-free nprobes: the probe budget rides into the
            # compiled program as a runtime int32 — one program per
            # index layout serves the whole nprobes range (np_max=128
            # covers every practical setting; see _masked_chunked_topk)
            np_max = _np_max_bucket(nprobes, self.nparts)
            np_rt = jnp.asarray(min(nprobes, np_max), jnp.int32)
            if self.index_type == "IVF_FLAT":
                # batched-query planner. With the query-grouped fused
                # scan (ops/pallas_group_scan.py) probed pairs dedupe to
                # at most ONE read of each probed partition, so the
                # probed path beats the shared full scan at every
                # measured point (np=20: 24.6k vs 5.5k qps; np=64:
                # 13.8k vs 5.5k — v5e, 1M x 128, batch 128). The full-
                # scan crossover only applies to the XLA chunked-gather
                # fallback, whose probed reads scale with qb*nprobes.
                fused_ok = (
                    _pallas_available()
                    and self._device["vectors"].shape[2] % 128 == 0
                    and self._device["vectors"].shape[1] % 8 == 0
                )
                if (
                    qb * nprobes >= 2.5 * self.nparts
                    and params.use_index_for_batch is not True
                    and not fused_ok
                ):
                    vals, slots = _ivf_full_scan_device(
                        qj, self._device["vectors"], self._device["norms2"], pen,
                        k=min(k_eff, self.num_slots), metric=self.metric,
                        has_mask=has_mask,
                    )
                else:
                    vals, slots = _ivf_flat_search_device_rt(
                        qj, self._device["centroids"], self._device["vectors"],
                        self._device["norms2"], pen, np_rt,
                        k=min(k_eff, self.num_slots), np_max=np_max,
                        metric=self.metric, has_mask=has_mask,
                        use_pallas=_pallas_available(),
                    )
            elif self.index_type == "IVF_RQ":
                vals, slots = _ivf_rq_search_device_rt(
                    qj, self._device["centroids"], self._device["bits"],
                    self._device["scales"], self._device["rnorms"],
                    self._device["rotation"], pen, np_rt,
                    k=min(k_eff, self.num_slots), np_max=np_max,
                    metric=self.metric, has_mask=has_mask,
                )
            elif self.index_type == "IVF_SQ":
                vals, slots = _ivf_sq_search_device_rt(
                    qj, self._device["centroids"], self._device["codes"],
                    self._device["norms2"], self._device["scale"], self._device["offset"],
                    pen, np_rt,
                    k=min(k_eff, self.num_slots), np_max=np_max,
                    metric=self.metric, has_mask=has_mask,
                )
            else:  # IVF_PQ
                vals, slots = _ivf_pq_search_device_rt(
                    qj, self._device["centroids"], self._device["codes"],
                    self._device["rnorms"], self._device["codebooks"], pen, np_rt,
                    k=k_eff, np_max=np_max, metric=self.metric, has_mask=has_mask,
                    use_pallas=_pallas_available(),
                    rotation=self._device.get("rotation"),
                )
        fused_refined = False
        if self.will_fuse_refine(params):
            # fused on-device refine: a second async jit chained on the
            # scan's outputs — the host never sees the k·refine
            # candidates, and the single device_get below still pays
            # only one tunnel round trip
            residual = getattr(self, "_refine_residual", False)
            vals, slots = _device_refine_step(
                qj, vals, slots,
                self._device["refine_slotmap"],
                self._device["refine_vecs"],
                self._device.get("refine_norms2", zero),
                k=min(params.k, k_eff),
                metric=self.metric,
                centroids=self._device["centroids"] if residual else None,
                pmax=self.pmax if residual else 0,
            )
            fused_refined = True
        # ONE device_get for both outputs: through the axon tunnel each
        # separate fetch pays a full round trip (~27 ms); fused they
        # ride one
        vals, slots = jax.device_get((vals, slots))
        vals = vals[:nq]
        slots = slots[:nq]
        rids = self.row_ids_flat[slots]
        invalid = vals >= PAD_PENALTY / 2
        rids = np.where(invalid, np.uint64(np.iinfo(np.uint64).max), rids)
        vals = np.where(invalid, np.float32(np.inf), vals)
        if (
            self.metric == "cosine"
            and not fused_refined
            and self.index_type in ("IVF_SQ", "IVF_PQ", "IVF_RQ")
        ):
            # those scans compute l2² on the unit sphere = 2·(1−cos);
            # FLAT / IVF_FLAT already produce cosine distance directly
            vals = np.where(np.isfinite(vals), vals / 2.0, vals)
        return vals.astype(np.float32), rids

    def refine(
        self,
        dataset,
        column: str,
        queries: np.ndarray,
        dists: np.ndarray,
        row_ids: np.ndarray,
        k: int,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Exact rerank of candidates: gather original full-precision
        vectors from the dataset (late materialization, reference
        SURVEY.md §3.2 refine) and recompute distances."""
        return refine_candidates(dataset, column, queries, row_ids, k, self.metric)


@partial(jax.jit, static_argnames=("k", "metric", "pmax"))
def _device_refine_step(
    q, vals, slots, slotmap, table, cnorms2, k: int, metric: str,
    centroids=None, pmax: int = 0,
):
    """Fused on-device refine: rerank the scan's k·refine candidates
    against a device-resident copy of the original vectors, inside the
    same dispatch chain as the scan (no host gather, no extra round
    trip — the host-side ``refine_candidates`` gather costs ~1.5 ms per
    query at SIFT1M shapes, capping the refined pipeline at ~650 qps
    regardless of batch size).

    q (Q, D) f32 (unit-norm for cosine); vals/slots (Q, kc) from the
    probed scan; slotmap (num_slots,) int32 slot → row in ``table``;
    table (M, D) f32/f16/bf16 (rows sorted by row id, unit-norm for
    cosine); cnorms2 (M,) exact f32 squared norms (l2 only). Candidates
    already penalized out (padding / filter / delete) carry
    vals >= PAD_PENALTY/2 and stay +inf. Reference parity: refine_factor
    rerank, reference query.rs:1329 — but gathering from HBM at MXU
    rate instead of late-materializing through the dataset.

    When pmax > 0 the table holds RESIDUALS against each slot's IVF
    block centroid (see prepare_device_refine): reconstruct
    x̂ = centroids[slot // pmax] + r in f32 before the dot — only r
    carries storage rounding, so the f16 error shrinks by ‖x‖/‖r‖."""
    rows = slotmap[slots]                           # (Q, kc)
    cand = jnp.take(table, rows, axis=0).astype(jnp.float32)  # (Q, kc, D)
    if pmax:
        cand = cand + jnp.take(centroids, slots // pmax, axis=0).astype(
            jnp.float32
        )
    # upcast the gathered candidates and accumulate in f32 at HIGHEST
    # precision: the (Q, kc, D) transient is tiny, so the only error
    # left is the storage rounding of `table` itself (f32 = exact,
    # f16 ≈ 2^-11, bf16 ≈ 2^-8 relative on the dot term)
    dots = jnp.einsum(
        "qd,qcd->qc", q.astype(jnp.float32), cand.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    if metric == "dot":
        exact = -dots
    elif metric == "cosine":
        exact = 1.0 - dots                          # both sides unit-norm
    else:
        qn2 = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=1, keepdims=True)
        exact = jnp.maximum(qn2 - 2.0 * dots + cnorms2[rows], 0.0)
    exact = jnp.where(vals >= PAD_PENALTY / 2, jnp.float32(np.inf), exact)
    v, pos = topk_smallest(exact, k)
    return v, jnp.take_along_axis(slots, pos, axis=1)


def refine_candidates(
    dataset, column: str, queries: np.ndarray, row_ids: np.ndarray, k: int, metric: str
) -> tuple[np.ndarray, np.ndarray]:
    """Exact rerank shared by the single-device and mesh-serving paths:
    gathers only the candidate rows (k·refine per query), never the
    index."""
    nq, cand = row_ids.shape
    flat_ids = row_ids.reshape(-1)
    valid = flat_ids != np.uint64(np.iinfo(np.uint64).max)
    uniq, inverse = np.unique(flat_ids[valid], return_inverse=True)
    tbl = dataset.take_rows(uniq, columns=[column])
    mat = fsl_to_numpy(tbl.column(column))
    if metric == "cosine":
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    gathered = np.zeros((nq * cand, mat.shape[1]), dtype=np.float32)
    gathered[valid] = mat[inverse]
    cands = gathered.reshape(nq, cand, -1)
    q = np.asarray(queries, dtype=np.float32)
    if metric == "cosine":
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    if cands.size <= 64 * 1024 * 1024:
        # small reranks compute on the host: the work is a few MFLOPs of
        # BLAS, while a device dispatch ships the (Q, K, D) candidate
        # tensor through the tunnel (measured 2.5 s for 64q x 100 x 960
        # vs ~10 ms host-side); on co-located hardware the host path is
        # still microseconds
        dots = np.einsum("qd,qkd->qk", q, cands, optimize=True)
        if metric == "dot":
            exact = -dots
        elif metric == "cosine":
            qn = np.linalg.norm(q, axis=-1)[:, None]
            cn = np.linalg.norm(cands, axis=-1)
            exact = 1.0 - dots / np.maximum(qn * cn, 1e-30)
        else:
            qn2 = np.sum(np.square(q), axis=-1)[:, None]
            cn2 = np.sum(np.square(cands), axis=-1)
            exact = np.maximum(qn2 - 2.0 * dots + cn2, 0.0)
        exact = exact.astype(np.float32)
    else:
        exact = np.asarray(refine_distances(jnp.asarray(q), jnp.asarray(cands), metric))
    exact = np.where(valid.reshape(nq, cand), exact, np.inf)
    order = np.argsort(exact, axis=1)[:, :k]
    return np.take_along_axis(exact, order, axis=1), np.take_along_axis(row_ids, order, axis=1)


def load_searcher(dataset, meta: IndexMeta):
    if meta.index_type.startswith("IVF_HNSW"):
        from .hnsw import HnswSearcher

        return HnswSearcher(dataset.store, dataset.index_dir(meta.uuid), meta)
    return VectorSearcher(dataset.store, dataset.index_dir(meta.uuid), meta)


def brute_force_search(
    vectors: np.ndarray,
    row_ids: np.ndarray,
    queries: np.ndarray,
    k: int,
    metric: str,
    precision: str = "float32",
) -> tuple[np.ndarray, np.ndarray]:
    """Index-free exact search over in-memory vectors (used for unindexed
    delta fragments and tiny tables)."""
    metric = normalize_metric(metric)
    k = min(k, len(vectors))
    q_dtype = np.uint8 if metric == "hamming" else np.float32
    q = np.atleast_2d(np.asarray(queries, dtype=q_dtype))
    d = np.asarray(
        pairwise_distance(
            jnp.asarray(q), jnp.asarray(vectors), metric,
            precision="bfloat16" if precision == "bfloat16" else "float32",
        )
    )
    vals, idx = topk_smallest(jnp.asarray(d), k)
    vals, idx = jax.device_get((vals, idx))  # one fused fetch
    return vals, row_ids[idx]
