"""Shared helpers for device kernels: padding, blocking, dtype policy."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MXU_LANE = 128  # MXU systolic array edge / VPU lane count
SUBLANE_F32 = 8


@functools.cache
def matmul_dtype():
    """Fast-matmul input dtype: bfloat16 on TPU (full MXU rate), float32
    on the CPU test backend (whose dot kernels lack bf16 support)."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pad_dim(mat: np.ndarray, multiple: int = MXU_LANE, axis: int = -1, value=0.0) -> np.ndarray:
    """Pad one axis up to a multiple (host-side, before device upload).

    Zero-padding the feature axis is exact for l2/dot/cosine distances:
    padded coordinates contribute 0 to every inner product and norm.
    """
    size = mat.shape[axis]
    target = round_up(size, multiple)
    if target == size:
        return mat
    pad_widths = [(0, 0)] * mat.ndim
    pad_widths[axis] = (0, target - size)
    return np.pad(mat, pad_widths, constant_values=value)


def pick_block_rows(num_rows: int, dim: int, budget_bytes: int = 256 << 20) -> int:
    """Choose a database block size for streamed scans: big enough to
    saturate the MXU, small enough to keep activations in budget."""
    rows = budget_bytes // max(1, dim * 4)
    rows = max(MXU_LANE * 8, min(num_rows, rows))
    return round_up(min(rows, 1 << 18), MXU_LANE)


INF = jnp.float32(3.4e38)


def group_probe_pairs(probe_ids: jax.Array, p: int, qpc: int):
    """Sort (query, probe) pairs by partition id and pad each
    partition's run to a multiple of ``qpc`` — the MoE-dispatch-style
    regrouping shared by the grouped Pallas probe kernels
    (pallas_group_scan.py, pallas_adc.py): every group of qpc
    consecutive slots shares ONE partition, so its block DMAs once per
    group instead of once per (query, probe) pair.

    All shapes are static. Returns
    ``(gpid, qidx, slot, order, g, spad)``:
      gpid (G,) int32 — partition per group (tail groups repeat the
        last real pid so Pallas's revisit cache skips their DMA)
      qidx (SPAD,) int32 — query index per padded slot (0 for padding)
      slot (S,) int32 — padded-layout position of each sorted pair
      order (S,) int32 — pair indices sorted by pid
      g, spad — static group/slot counts
    """
    q, np_ = probe_ids.shape
    s = q * np_
    flat = probe_ids.reshape(-1).astype(jnp.int32)
    order = jnp.argsort(flat)                     # pair indices, pid-sorted
    spids = flat[order]                           # (S,)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), spids[1:] != spids[:-1]]
    )
    start_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, jnp.arange(s), 0)
    )
    rank = jnp.arange(s) - start_idx              # rank within the pid run
    counts = jnp.zeros((p,), jnp.int32).at[flat].add(1)
    padded = ((counts + qpc - 1) // qpc) * qpc
    poff = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)[:-1]]
    )
    slot = poff[spids] + rank                     # position in padded layout

    # static bound: at most min(P, S) partitions are probed, each padded
    # by < qpc slots
    spad = ((s + min(p, s) * (qpc - 1)) + qpc - 1) // qpc * qpc
    g = spad // qpc
    qidx = jnp.zeros((spad,), jnp.int32).at[slot].set(order // np_)
    gpid = jnp.full((g,), spids[-1], jnp.int32).at[slot // qpc].set(spids)
    return gpid, qidx, slot, order, g, spad
