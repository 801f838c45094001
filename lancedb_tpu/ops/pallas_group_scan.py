"""Pallas TPU kernel: query-grouped fused IVF_FLAT probed scan.

The round-1 fused scan (ops/pallas_scan.py) lost to the XLA chunked
gather because its grid had ONE (query, probe) pair per cell: 3584
cells × fixed per-cell cost at SIFT1M/batch-128 shapes swamped the DMA
floor, and each partition block was re-read once per querying query.

This kernel restructures the loop the way MoE dispatch does:

  host/XLA (in-jit, static shapes):
    sort the (query, probe) pairs by partition id, pad each partition's
    run to a multiple of QPC, so every group of QPC consecutive slots
    shares ONE partition;
  kernel grid = (group, pmax-block):
    DMA the group's partition block once, matmul it against the
    group's QPC query vectors on the MXU:
        dots (QPC, PB) = qgrp (QPC, D) · blockᵀ (D, PB)
        out = α ⊙ dots + norms + γ
  scatter-back (XLA): slot → original (query, probe) order.

Effects vs one-pair-per-cell: grid cells shrink from Q·NP to
~Q·NP/avg_group_fill, each probed partition is read ≈once per batch
(HBM traffic drops by the mean queries-per-partition), and the matvec
becomes an (QPC, D)·(D, PB) matmul. Pallas also skips the DMA entirely
when consecutive groups hit the same partition (revisit caching).

Reference behavior: lance Scanner's concurrent probed partition scan
(SURVEY.md §2.6 "IVF partition parallelism").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .util import group_probe_pairs


def _group_cell_kernel(
    gpid_ref,    # scalar prefetch: (G,) int32 — partition per group
    qgrp_ref,    # (1, QPC, D) f32 — the group's query vectors
    coef_ref,    # (1, 2, QPC) f32 — per-slot [alpha; gamma]
    vecs_ref,    # (1, PB, D) f32 — the group's partition block
    norms_ref,   # (1, 1, PB) f32 (+penalties, +inf padding)
    out_ref,     # (1, QPC, PB) f32
):
    block = vecs_ref[0].astype(jnp.float32)      # (PB, D)
    qg = qgrp_ref[0].astype(jnp.float32)         # (QPC, D)
    # full f32 MXU matmul (precision=HIGHEST avoids bf16 rounding)
    dots = jax.lax.dot_general(
        qg, block,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (QPC, PB)
    alpha = coef_ref[0, 0][:, None]              # (QPC, 1)
    gamma = coef_ref[0, 1][:, None]
    out_ref[0] = alpha * dots + norms_ref[0] + gamma


@functools.partial(jax.jit, static_argnames=("qpc", "interpret"))
def ivf_flat_grouped_scan_pallas(
    probe_ids: jax.Array,  # (Q, NP) int32
    queries: jax.Array,    # (Q, D) f32
    vectors: jax.Array,    # (P, pmax, D) f32, D % 128 == 0, pmax % 8 == 0
    norms: jax.Array,      # (P, pmax) f32 — metric-specific additive term
    alpha: jax.Array,      # (Q,) f32
    gamma: jax.Array,      # (Q,) f32
    qpc: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fused grouped probe-scan distances → (Q, NP, pmax) f32."""
    q, np_ = probe_ids.shape
    p, pmax, d = vectors.shape
    if d % 128:
        raise ValueError(f"dim {d} must be a multiple of 128 for the fused scan")

    # ---- in-jit grouping (all static shapes; shared helper) -----------
    gpid, qidx, slot, order, g, spad = group_probe_pairs(probe_ids, p, qpc)
    qgrp = queries.astype(jnp.float32)[qidx].reshape(g, qpc, d)
    coef = jnp.stack(
        [alpha.astype(jnp.float32)[qidx], gamma.astype(jnp.float32)[qidx]], axis=1
    )  # (SPAD, 2) -> regroup
    coef = coef.reshape(g, qpc, 2).transpose(0, 2, 1)  # (G, 2, QPC)

    # ---- kernel --------------------------------------------------------
    bytes_per_slot = d * 4
    if pmax * bytes_per_slot <= (4 << 20):
        pb = pmax
    else:
        pb = max(8, ((4 << 20) // bytes_per_slot) // 8 * 8)
        while pmax % pb:
            pb -= 8
    nb = pmax // pb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g, nb),
        in_specs=[
            pl.BlockSpec((1, qpc, d), lambda gi, b, gp: (gi, 0, 0)),
            pl.BlockSpec((1, 2, qpc), lambda gi, b, gp: (gi, 0, 0)),
            pl.BlockSpec((1, pb, d), lambda gi, b, gp: (gp[gi], b, 0)),
            pl.BlockSpec((1, 1, pb), lambda gi, b, gp: (gp[gi], 0, b)),
        ],
        out_specs=pl.BlockSpec((1, qpc, pb), lambda gi, b, gp: (gi, 0, b)),
    )
    out = pl.pallas_call(
        _group_cell_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, qpc, pmax), jnp.float32),
        interpret=interpret,
    )(
        gpid,
        qgrp,
        coef,
        vectors.astype(jnp.float32),
        norms.reshape(p, 1, pmax).astype(jnp.float32),
    )

    # ---- scatter back to (Q, NP, pmax) --------------------------------
    res_sorted = out.reshape(g * qpc, pmax)[slot]  # (S, pmax), pid-sorted
    inv = jnp.argsort(order)
    return res_sorted[inv].reshape(q, np_, pmax)
