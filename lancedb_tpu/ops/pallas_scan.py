"""Pallas TPU kernel: fused IVF_FLAT probed scan.

The XLA formulation gathers probed partition blocks with `jnp.take`
— the gathered (Q, nprobes, pmax, D) tensor round-trips HBM and the
gather itself runs far from DMA speed (~6× over the read floor at
SIFT1M shapes). This kernel reads each probed block straight from the
global vectors array via a scalar-prefetched BlockSpec index_map
(double-buffered by Pallas) and writes fused distances; top-k stays
in XLA.

Per grid cell (query, probe, pmax-block):
    dot[p]  = Σ_d  block[p, d] · q[d]          (VPU multiply + lane reduce)
    out[p]  = α_q · dot[p] + norms[p] + γ_q

with per-query scalars (α, γ) covering every metric:
    l2:     α = −2,      γ = |q|²,  norms = |x|² (+inf padding)
    cosine: α = −1,      γ = 1,     norms = padding penalty (unit vectors)
    dot:    α = −1,      γ = 0,     norms = padding penalty
Filter/deletion penalties fold into `norms` by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scan_cell_kernel(
    probe_ids_ref,  # scalar prefetch: (Q*NP,) int32
    alpha_ref,      # scalar prefetch: (Q,) f32
    gamma_ref,      # scalar prefetch: (Q,) f32
    q_ref,          # (1, 1, D) f32 — this query's vector
    vecs_ref,       # (1, PB, D) storage dtype — this probe's block slice
    norms_ref,      # (1, PB, 1) f32 (+penalties, +inf padding)
    out_ref,        # (1, 1, PB, 1) f32
):
    qi = pl.program_id(0)
    block = vecs_ref[0].astype(jnp.float32)  # (PB, D)
    q = q_ref[0].astype(jnp.float32)  # (1, D)
    # VPU multiply + lane reduce keeps full f32 precision (an MXU
    # matvec would round operands to bf16 at default precision)
    dots = jnp.sum(block * q, axis=1, keepdims=True)  # (PB, 1)
    a = alpha_ref[qi]
    g = gamma_ref[qi]
    out_ref[0, 0] = a * dots + norms_ref[0] + g


@functools.partial(jax.jit, static_argnames=("interpret",))
def ivf_flat_scan_pallas(
    probe_ids: jax.Array,  # (Q, NP) int32
    queries: jax.Array,    # (Q, D) f32
    vectors: jax.Array,    # (P, pmax, D) f32 or bf16, pmax % 8 == 0, D % 128 == 0
    norms: jax.Array,      # (P, pmax) f32 — metric-specific additive term
    alpha: jax.Array,      # (Q,) f32
    gamma: jax.Array,      # (Q,) f32
    interpret: bool = False,
) -> jax.Array:
    """Fused probe-scan distances → (Q, NP, pmax) f32."""
    q, np_ = probe_ids.shape
    p, pmax, d = vectors.shape
    if d % 128:
        raise ValueError(f"dim {d} must be a multiple of 128 for the fused scan")
    # block the slot (sublane) axis only when one partition block would
    # blow the VMEM budget — grid cells carry fixed overhead, so fewer,
    # fatter cells win (block bytes ≤ ~4 MB keeps double-buffering happy)
    bytes_per_slot = d * vectors.dtype.itemsize
    if pmax * bytes_per_slot <= (4 << 20):
        pb = pmax
    else:
        pb = max(8, ((4 << 20) // bytes_per_slot) // 8 * 8)
        while pmax % pb:
            pb -= 8
    nb = pmax // pb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(q, np_, nb),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda qi, j, b, pids, a, g: (qi, 0, 0)),
            pl.BlockSpec(
                (1, pb, d), lambda qi, j, b, pids, a, g: (pids[qi * np_ + j], b, 0)
            ),
            pl.BlockSpec(
                (1, pb, 1), lambda qi, j, b, pids, a, g: (pids[qi * np_ + j], b, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, pb, 1), lambda qi, j, b, pids, a, g: (qi, j, b, 0)
        ),
    )
    out = pl.pallas_call(
        _scan_cell_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q, np_, pmax, 1), jnp.float32),
        interpret=interpret,
    )(
        probe_ids.reshape(-1).astype(jnp.int32),
        alpha.reshape(-1).astype(jnp.float32),
        gamma.reshape(-1).astype(jnp.float32),
        queries.reshape(q, 1, d).astype(jnp.float32),
        vectors,
        norms.reshape(p, pmax, 1).astype(jnp.float32),
    )
    return out.reshape(q, np_, pmax)
