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
