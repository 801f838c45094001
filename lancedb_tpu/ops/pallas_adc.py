"""Pallas TPU kernel: fused IVF_PQ ADC probe scan.

The XLA formulation of the probed ADC scan (index/vector.py
`_ivf_pq_search_device`) materializes a gathered code tensor
(Q, nprobes, pmax, S) in HBM plus a one-hot intermediate. This kernel
removes both memory round-trips:

* grid = (Q, nprobes); each cell DMAs ONE partition's code block
  (pmax, S) straight from the global codes array — the partition id
  comes from a scalar-prefetched probe table feeding the BlockSpec
  index_map (pltpu.PrefetchScalarGridSpec), so no gather tensor ever
  exists in HBM.
* inside the cell the LUT sum  qdotr[p] = Σ_s dlut[s, codes[p, s]]
  is computed chunk-by-chunk with an iota-compare one-hot contraction
  (MXU-friendly; no scalar gathers on the VPU), bounded to
  (pmax, CHUNK, K) of VMEM.
* the cell writes the fused distance  |q|² − 2(q·c_p + q·r̃) + |x̃|²
  directly — one (pmax,) vector per (query, probe) — leaving only the
  final top-k for XLA.

Codes' subvector axis is padded to the 128-lane boundary host-side;
the padded dlut entries are zero so padding contributes nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .util import round_up

# subvectors processed per one-hot chunk (VMEM: pmax × CHUNK × K bf16)
_S_CHUNK = 8


def _adc_cell_kernel(
    probe_ids_ref,  # scalar prefetch: (Q*NP,) int32
    dlut_ref,       # (1, S_pad, K) f32 — this query's dot-LUT
    codes_ref,      # (1, pmax, S_pad) uint8 — this probe's partition block
    rnorms_ref,     # (1, pmax) f32
    qc_ref,         # (1, 1) f32 in SMEM — q·c_p for this (query, probe)
    qn2_ref,        # (1, 1) f32 in SMEM — |q|²
    out_ref,        # (1, 1, pmax) f32
):
    pmax = codes_ref.shape[1]
    s_pad = codes_ref.shape[2]
    k = dlut_ref.shape[2]
    codes = codes_ref[0].astype(jnp.int32)  # (pmax, S_pad)

    def chunk_body(ci, acc):
        s0 = ci * _S_CHUNK
        c = jax.lax.dynamic_slice(codes, (0, s0), (pmax, _S_CHUNK))  # (pmax, C)
        lut = jax.lax.dynamic_slice(dlut_ref[0], (s0, 0), (_S_CHUNK, k))  # (C, K)
        steps = jax.lax.broadcasted_iota(jnp.int32, (pmax, _S_CHUNK, k), 2)
        onehot = (c[:, :, None] == steps).astype(jnp.bfloat16)  # (pmax, C, K)
        contrib = jax.lax.dot_general(
            onehot.reshape(pmax, _S_CHUNK * k),
            lut.astype(jnp.bfloat16).reshape(_S_CHUNK * k, 1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (pmax, 1)
        return acc + contrib[:, 0]

    n_chunks = s_pad // _S_CHUNK
    qdotr = jax.lax.fori_loop(0, n_chunks, chunk_body, jnp.zeros((pmax,), jnp.float32))
    qdotx = qc_ref[0, 0] + qdotr
    out_ref[0, 0, :] = qn2_ref[0, 0] - 2.0 * qdotx + rnorms_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def ivf_pq_adc_scan_pallas(
    probe_ids: jax.Array,  # (Q, NP) int32
    dlut: jax.Array,       # (Q, S_pad, K) f32 (padded subvectors → zero rows)
    codes: jax.Array,      # (P, pmax, S_pad) uint8
    rnorms: jax.Array,     # (P, pmax) f32 (+inf padding slots)
    qc_dots: jax.Array,    # (Q, NP) f32 — q·c_p per probe
    qn2: jax.Array,        # (Q,) f32
    interpret: bool = False,
) -> jax.Array:
    """Fused probe-scan distances → (Q, NP, pmax) f32."""
    q, np_ = probe_ids.shape
    p, pmax, s_pad = codes.shape
    k = dlut.shape[2]
    assert s_pad % _S_CHUNK == 0, "pad subvectors to a multiple of the chunk"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(q, np_),
        in_specs=[
            pl.BlockSpec((1, s_pad, k), lambda qi, j, pids: (qi, 0, 0)),
            pl.BlockSpec((1, pmax, s_pad), lambda qi, j, pids: (pids[qi * np_ + j], 0, 0)),
            pl.BlockSpec((1, pmax), lambda qi, j, pids: (pids[qi * np_ + j], 0)),
            pl.BlockSpec((1, 1), lambda qi, j, pids: (qi, j), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda qi, j, pids: (qi, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, pmax), lambda qi, j, pids: (qi, j, 0)),
    )
    return pl.pallas_call(
        _adc_cell_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q, np_, pmax), jnp.float32),
        interpret=interpret,
    )(
        probe_ids.reshape(-1).astype(jnp.int32),
        dlut.astype(jnp.float32),
        codes,
        rnorms.astype(jnp.float32),
        qc_dots.astype(jnp.float32),
        qn2.reshape(-1, 1).astype(jnp.float32),
    )


def pad_codes_for_pallas(
    codes: np.ndarray, codebooks: np.ndarray
) -> tuple[np.ndarray, int]:
    """Pad the subvector axis to the chunk boundary; returns (codes, s_pad)."""
    s = codes.shape[-1]
    s_pad = round_up(s, _S_CHUNK)
    if s_pad != s:
        pad = [(0, 0)] * (codes.ndim - 1) + [(0, s_pad - s)]
        codes = np.pad(codes, pad)
    return codes, s_pad


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
