"""Pallas TPU kernel: fused IVF_PQ ADC probe scan.

The XLA formulation of the probed ADC scan (index/vector.py
`_ivf_pq_search_device`) materializes a per-query one-hot tensor
(Q, pmax, S, K) in HBM every probe step — ~1 GB of HBM traffic per
step at SIFT1M shapes, which makes the PQ scan *slower* than the
uncompressed IVF_FLAT scan. This kernel keeps everything in VMEM:

* grid = (Q, nprobes); each cell DMAs ONE partition's code block
  (S, pmax) uint8 straight from the global codes array — the partition
  id comes from a scalar-prefetched probe table feeding the BlockSpec
  index_map (pltpu.PrefetchScalarGridSpec), so no gathered code tensor
  ever exists in HBM, and Pallas double-buffers the DMA across cells.
* the LUT sum  qdotr[p] = Σ_s dlut[s, codes[s, p]]  runs as an
  in-VMEM lane gather: Mosaic's `tpu.dynamic_gather` does a true
  per-lane table lookup within one 128-lane vreg row
  (take_along_axis(x, idx, axis=1) with x.shape == idx.shape ==
  (S, 128)). The LUT is laid out as NT = ceil(K/128) tables of
  (S, 128); K ≤ 128 (the 4-bit Quick-ADC point) is ONE gather per
  128-slot chunk, K = 256 is two gathers merged by the code's high
  bit. This replaced a K-step compare-select sweep (O(S·K) VPU ops
  per slot) with O(S) gathers — measured 30× on the 8-bit path and
  1.2× on 4-bit at SIFT1M shapes (scripts/ab_adc8.py).
* the cell writes the fused distance  |q|² − 2(q·c_p + q·r̃) + |x̃|²
  directly — one (pmax,) row per (query, probe) — leaving only the
  final top-k for XLA. Deletion/prefilter penalties are folded into
  the rnorms operand by the caller, so the kernel never branches.

Reference behavior matched: lance's ADC scan over probed IVF
partitions (SURVEY.md §2.9 "Scanner physical plans", §3.2 hot loop).

TPU tiling notes (pallas_guide.md): blocks must have their last two
dims (mult-of-8, mult-of-128) or equal to the array dims, so pmax is
padded to 128 and singleton axes are inserted for per-cell rows
(rnorms (P, 1, pmax), out (Q, NP, 1, pmax)); codes carry subvectors
on the sublane axis (S is kept a multiple of 8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .util import round_up

# pmax (lane) alignment required by the kernel's block specs
PMAX_ALIGN = 128
# subvector (sublane) alignment
S_ALIGN = 8


LANE = 128  # vreg lane width: dynamic_gather operates within one row

# codebook size at/below which the one-hot select sweep beats the lane
# gather (measured on v5e at SIFT1M shapes: K=16 select 7.4 ms/batch vs
# gather 11.0 ms; K=256 gather 7.6 ms vs select 169 ms)
SELECT_MAX_K = 64


def _adc_cell_kernel_gather(
    probe_ids_ref,  # scalar prefetch: (Q*NP,) int32
    qc_ref,         # scalar prefetch: (Q*NP,) f32 — q·c_p per (query, probe)
    qn2_ref,        # scalar prefetch: (Q,) f32 — |q|²
    dlut_ref,       # (1, NT, S, 128) f32 — this query's dot-LUT as lane tables
    codes_ref,      # (1, S, pmax) uint8 — this probe's partition block
    rnorms_ref,     # (1, 1, pmax) f32 (+penalty, +inf padding)
    out_ref,        # (1, 1, 1, pmax) f32
):
    qi = pl.program_id(0)
    j = pl.program_id(1)
    np_ = pl.num_programs(1)
    codes = codes_ref[0].astype(jnp.int32)  # (S, PB)
    s, pmax = codes.shape
    _, nt, _, _ = dlut_ref.shape

    # per-lane LUT gather, one 128-lane chunk at a time (static unroll)
    qdotx = qc_ref[qi * np_ + j]
    base = qn2_ref[qi] - 2.0 * qdotx
    for c in range(pmax // LANE):
        cj = codes[:, c * LANE : (c + 1) * LANE]  # (S, 128)
        if nt == 1:
            g = jnp.take_along_axis(dlut_ref[0, 0], cj, axis=1)
        else:
            cm = jax.lax.bitwise_and(cj, LANE - 1)
            g = jnp.take_along_axis(dlut_ref[0, 0], cm, axis=1)
            for t in range(1, nt):
                gt = jnp.take_along_axis(dlut_ref[0, t], cm, axis=1)
                g = jnp.where(jax.lax.shift_right_logical(cj, 7) == t, gt, g)
        qdotr = jnp.sum(g, axis=0)  # (128,)
        out_ref[0, 0, 0, c * LANE : (c + 1) * LANE] = (
            base - 2.0 * qdotr + rnorms_ref[0, 0, c * LANE : (c + 1) * LANE]
        )


def _adc_cell_kernel_select(
    probe_ids_ref,  # scalar prefetch: (Q*NP,) int32
    qc_ref,         # scalar prefetch: (Q*NP,) f32
    qn2_ref,        # scalar prefetch: (Q,) f32
    dlut_ref,       # (1, S, K) f32 — this query's dot-LUT (K ≤ SELECT_MAX_K)
    codes_ref,      # (1, S, pmax) uint8
    rnorms_ref,     # (1, 1, pmax) f32
    out_ref,        # (1, 1, 1, pmax) f32
):
    qi = pl.program_id(0)
    j = pl.program_id(1)
    np_ = pl.num_programs(1)
    codes = codes_ref[0].astype(jnp.int32)  # (S, PB)
    s, pmax = codes.shape
    k = dlut_ref.shape[2]

    # one-hot select sweep: step c adds where(codes == c, dlut[:, c], 0)
    steps = jax.lax.broadcasted_iota(jnp.int32, (s, k, pmax), 1)
    hit = codes[:, None, :] == steps  # (S, K, PB)
    lut3 = jnp.broadcast_to(dlut_ref[0][:, :, None], (s, k, pmax))
    qdotr = jnp.sum(jnp.where(hit, lut3, 0.0), axis=(0, 1))[None, :]  # (1, PB)
    qdotx = qc_ref[qi * np_ + j] + qdotr
    out_ref[0, 0] = qn2_ref[qi] - 2.0 * qdotx + rnorms_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ivf_pq_adc_scan_pallas(
    probe_ids: jax.Array,  # (Q, NP) int32
    dlut: jax.Array,       # (Q, S, K) f32
    codes: jax.Array,      # (P, S, pmax) uint8, pmax % 128 == 0, S % 8 == 0
    rnorms: jax.Array,     # (P, pmax) f32 (+inf padding; penalties pre-added)
    qc_dots: jax.Array,    # (Q, NP) f32 — q·c_p per probe
    qn2: jax.Array,        # (Q,) f32
    interpret: bool = False,
) -> jax.Array:
    """Fused probe-scan distances → (Q, NP, pmax) f32."""
    q, np_ = probe_ids.shape
    p, s, pmax = codes.shape
    k = dlut.shape[2]
    if pmax % PMAX_ALIGN:
        raise ValueError(f"pmax {pmax} must be a multiple of {PMAX_ALIGN}")
    if s % S_ALIGN:
        raise ValueError(f"padded subvector count {s} must be a multiple of {S_ALIGN}")

    if k <= SELECT_MAX_K:
        # small codebooks (4-bit): K-step one-hot select sweep
        kernel = _adc_cell_kernel_select
        dlut_in = dlut.astype(jnp.float32)
        dlut_spec_shape = (1, s, k)
    else:
        # big codebooks (8-bit): lay the LUT out as NT tables of
        # (S, 128) lanes — dynamic_gather looks up within one 128-lane
        # row, so K ≤ 128 pads to one table and K = 256 splits into two
        # selected by the code's high bit
        nt = max(1, -(-k // LANE))
        dlut_in = dlut.astype(jnp.float32)
        if k < nt * LANE:
            dlut_in = jnp.pad(dlut_in, ((0, 0), (0, 0), (0, nt * LANE - k)))
        dlut_in = dlut_in.reshape(q, s, nt, LANE).transpose(0, 2, 1, 3)
        kernel = _adc_cell_kernel_gather
        dlut_spec_shape = (1, nt, s, LANE)

    # block the slot (lane) axis so the per-cell working set stays well
    # under the ~16 MB VMEM budget even for very unbalanced partitions
    pb = 512 if pmax % 512 == 0 else (256 if pmax % 256 == 0 else 128)
    nb = pmax // pb

    ndl = len(dlut_spec_shape) - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(q, np_, nb),
        in_specs=[
            pl.BlockSpec(
                dlut_spec_shape, lambda qi, j, b, pids, qc, qn: (qi,) + (0,) * ndl
            ),
            pl.BlockSpec(
                (1, s, pb), lambda qi, j, b, pids, qc, qn: (pids[qi * np_ + j], 0, b)
            ),
            pl.BlockSpec(
                (1, 1, pb), lambda qi, j, b, pids, qc, qn: (pids[qi * np_ + j], 0, b)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, pb), lambda qi, j, b, pids, qc, qn: (qi, j, 0, b)
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q, np_, 1, pmax), jnp.float32),
        interpret=interpret,
    )(
        probe_ids.reshape(-1).astype(jnp.int32),
        qc_dots.reshape(-1).astype(jnp.float32),
        qn2.reshape(-1).astype(jnp.float32),
        dlut_in,
        codes,
        rnorms.reshape(p, 1, pmax).astype(jnp.float32),
    )
    return out.reshape(q, np_, pmax)


def _adc_group_cell_kernel_onehot(
    gpid_ref,    # scalar prefetch: (G,) int32 — partition per group
    base_ref,    # scalar prefetch: (SPAD,) f32 — qn2[q] − 2·(q·c_p) per slot
    dlutg_ref,   # (1, QPC, S*K) f32 — the group's flattened dot-LUTs
    codes_ref,   # (1, S, PB) uint8 — the group's partition block
    rnorms_ref,  # (1, 1, PB) f32 (+penalty, +inf padding)
    out_ref,     # (1, QPC, PB) f32
    *,
    k: int,
):
    """Shared-decode ADC: ONE in-VMEM one-hot of the partition's codes
    serves every query in the group via an MXU matmul —
      qdotr (QPC, PB) = dlut_g (QPC, S·K) @ onehot (S·K, PB)
    The old XLA formulation materialized this one-hot per QUERY in HBM
    (~150 MB per probe step at SIFT1M shapes); here it is built once
    per PARTITION and never leaves VMEM."""
    gi = pl.program_id(0)
    qpc = out_ref.shape[1]
    codes = codes_ref[0].astype(jnp.int32)        # (S, PB)
    s, pb = codes.shape
    steps = jax.lax.broadcasted_iota(jnp.int32, (s, k, pb), 1)
    # bf16 one-hot: halves the VMEM transient and feeds the MXU at
    # full rate; the LUT values accumulate in f32
    oh = (codes[:, None, :] == steps).astype(jnp.bfloat16).reshape(s * k, pb)
    dots = jax.lax.dot_general(
        dlutg_ref[0].astype(jnp.bfloat16), oh,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (QPC, PB)
    rn = rnorms_ref[0]                             # (1, PB)
    for gq in range(qpc):
        base = base_ref[gi * qpc + gq]
        out_ref[0, gq] = base - 2.0 * dots[gq] + rn[0]


def _adc_group_cell_kernel_gather(
    gpid_ref,    # scalar prefetch: (G,) int32
    qidx_ref,    # scalar prefetch: (SPAD,) int32 — query per slot
    base_ref,    # scalar prefetch: (SPAD,) f32
    dlut_ref,    # (Q, NT, S, 128) f32 — ALL queries' lane tables, resident
    codes_ref,   # (1, S, PB) uint8
    rnorms_ref,  # (1, 1, PB) f32
    out_ref,     # (1, QPC, PB) f32
):
    """Grouped lane-gather ADC for big codebooks (K > SELECT_MAX_K,
    e.g. 8-bit): the full dot-LUT array stays VMEM-resident across
    cells (constant index_map → one DMA), each group slot gathers its
    own query's tables. Amortizes the codes DMA and grid overhead by
    QPC like the one-hot variant without an S·K-row decode."""
    gi = pl.program_id(0)
    qpc = out_ref.shape[1]
    codes = codes_ref[0].astype(jnp.int32)        # (S, PB)
    s, pb = codes.shape
    nt = dlut_ref.shape[1]
    rn = rnorms_ref[0]
    for gq in range(qpc):
        sidx = gi * qpc + gq
        qid = qidx_ref[sidx]
        base = base_ref[sidx]
        for c in range(pb // LANE):
            cj = codes[:, c * LANE : (c + 1) * LANE]
            if nt == 1:
                g = jnp.take_along_axis(dlut_ref[qid, 0], cj, axis=1)
            else:
                cm = jax.lax.bitwise_and(cj, LANE - 1)
                g = jnp.take_along_axis(dlut_ref[qid, 0], cm, axis=1)
                for t in range(1, nt):
                    gt = jnp.take_along_axis(dlut_ref[qid, t], cm, axis=1)
                    g = jnp.where(jax.lax.shift_right_logical(cj, 7) == t, gt, g)
            qdotr = jnp.sum(g, axis=0)            # (128,)
            out_ref[0, gq, c * LANE : (c + 1) * LANE] = (
                base - 2.0 * qdotr + rn[0, c * LANE : (c + 1) * LANE]
            )


@functools.partial(jax.jit, static_argnames=("qpc", "interpret"))
def ivf_pq_adc_grouped_scan_pallas(
    probe_ids: jax.Array,  # (Q, NP) int32
    dlut: jax.Array,       # (Q, S, K) f32
    codes: jax.Array,      # (P, S, pmax) uint8, pmax % 128 == 0, S % 8 == 0
    rnorms: jax.Array,     # (P, pmax) f32 (+inf padding; penalties pre-added)
    qc_dots: jax.Array,    # (Q, NP) f32 — q·c_p per probe
    qn2: jax.Array,        # (Q,) f32
    qpc: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Query-grouped fused probe-scan distances → (Q, NP, pmax) f32.

    Restructures the (query, probe) grid of ivf_pq_adc_scan_pallas the
    way pallas_group_scan does for IVF_FLAT: pairs sort by partition,
    each group of qpc slots shares one partition block DMA. Small
    codebooks decode the block to a one-hot ONCE per group and ride the
    MXU; big codebooks keep every query's lane tables VMEM-resident and
    gather per slot."""
    from .util import group_probe_pairs

    q, np_ = probe_ids.shape
    p, s, pmax = codes.shape
    k = dlut.shape[2]
    if pmax % PMAX_ALIGN:
        raise ValueError(f"pmax {pmax} must be a multiple of {PMAX_ALIGN}")
    if s % S_ALIGN:
        raise ValueError(f"padded subvector count {s} must be a multiple of {S_ALIGN}")

    gpid, qidx, slot, order, g, spad = group_probe_pairs(probe_ids, p, qpc)
    # per-slot affine base: qn2[q] − 2·(q·c_p), scattered to padded layout
    pair_base = (qn2[:, None] - 2.0 * qc_dots).reshape(-1).astype(jnp.float32)
    base = jnp.zeros((spad,), jnp.float32).at[slot].set(pair_base[order])

    # one whole-pmax block per cell when the one-hot transient fits
    # VMEM comfortably — grid cells carry fixed Mosaic overhead, so
    # fewer, fatter cells win (bf16 one-hot: S·K·pmax·2 bytes)
    if k <= SELECT_MAX_K and s * k * pmax * 2 <= (4 << 20):
        pb = pmax
    else:
        pb = 512 if pmax % 512 == 0 else (256 if pmax % 256 == 0 else 128)
    nb = pmax // pb
    rnorms_in = rnorms.reshape(p, 1, pmax).astype(jnp.float32)

    if k <= SELECT_MAX_K:
        # group LUTs gathered to slot layout, flattened (S·K) for the
        # in-kernel one-hot matmul (row s·K + c ↔ code c of subvector s)
        dlutg = (
            dlut.astype(jnp.float32)[qidx]
            .reshape(g, qpc, s * k)
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(g, nb),
            in_specs=[
                pl.BlockSpec((1, qpc, s * k), lambda gi, b, gp, ba: (gi, 0, 0)),
                pl.BlockSpec((1, s, pb), lambda gi, b, gp, ba: (gp[gi], 0, b)),
                pl.BlockSpec((1, 1, pb), lambda gi, b, gp, ba: (gp[gi], 0, b)),
            ],
            out_specs=pl.BlockSpec((1, qpc, pb), lambda gi, b, gp, ba: (gi, 0, b)),
        )
        out = pl.pallas_call(
            functools.partial(_adc_group_cell_kernel_onehot, k=k),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((g, qpc, pmax), jnp.float32),
            interpret=interpret,
        )(gpid, base, dlutg, codes, rnorms_in)
    else:
        nt = max(1, -(-k // LANE))
        dlut_in = dlut.astype(jnp.float32)
        if k < nt * LANE:
            dlut_in = jnp.pad(dlut_in, ((0, 0), (0, 0), (0, nt * LANE - k)))
        dlut_in = dlut_in.reshape(q, s, nt, LANE).transpose(0, 2, 1, 3)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(g, nb),
            in_specs=[
                pl.BlockSpec(
                    (q, nt, s, LANE), lambda gi, b, gp, qi_, ba: (0, 0, 0, 0)
                ),
                pl.BlockSpec((1, s, pb), lambda gi, b, gp, qi_, ba: (gp[gi], 0, b)),
                pl.BlockSpec((1, 1, pb), lambda gi, b, gp, qi_, ba: (gp[gi], 0, b)),
            ],
            out_specs=pl.BlockSpec(
                (1, qpc, pb), lambda gi, b, gp, qi_, ba: (gi, 0, b)
            ),
        )
        out = pl.pallas_call(
            _adc_group_cell_kernel_gather,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((g, qpc, pmax), jnp.float32),
            interpret=interpret,
        )(gpid, qidx, base, dlut_in, codes, rnorms_in)

    # scatter back to (Q, NP, pmax)
    res_sorted = out.reshape(g * qpc, pmax)[slot]
    inv = jnp.argsort(order)
    return res_sorted[inv].reshape(q, np_, pmax)


def pad_codes_for_pallas(codes_psp: np.ndarray) -> np.ndarray:
    """Pad a (P, S, pmax) code array to kernel alignment (S→8, pmax→128).

    Padded subvector rows hold code 0 and rely on zero dlut rows;
    padded pmax slots are masked by +inf rnorms.
    """
    p, s, pmax = codes_psp.shape
    s_pad, pmax_pad = round_up(s, S_ALIGN), round_up(pmax, PMAX_ALIGN)
    if (s_pad, pmax_pad) != (s, pmax):
        codes_psp = np.pad(codes_psp, ((0, 0), (0, s_pad - s), (0, pmax_pad - pmax)))
    return codes_psp


def build_dlut_padded(q: np.ndarray, codebooks: np.ndarray, s_pad: int) -> np.ndarray:
    """Per-query dot LUT dlut[q, s, c] = q_s · cb[s, c], zero rows for the
    padded subvectors (code 0 in padding contributes 0)."""
    qf = np.asarray(q, dtype=np.float32)
    nsub, k, dsub = codebooks.shape
    qs = qf.reshape(qf.shape[0], nsub, dsub)
    dlut = np.einsum("qsd,skd->qsk", qs, codebooks.astype(np.float32))
    if s_pad != nsub:
        dlut = np.pad(dlut, ((0, 0), (0, s_pad - nsub), (0, 0)))
    return dlut.astype(np.float32)
