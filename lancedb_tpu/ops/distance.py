"""Distance kernels: MXU-tiled matmul formulations of every metric.

The reference's lance-linalg crate provides SIMD L2/cosine/dot/hamming
kernels (SURVEY.md §2.9 "lance-linalg"). On TPU every metric reduces to
a matmul plus elementwise post-ops so the MXU does the FLOPs:

    l2(q, x)     = |q|^2 - 2 q·x + |x|^2          (squared L2, like lance)
    cosine(q, x) = 1 - (q·x) / (|q| |x|)
    dot(q, x)    = -(q·x)                          (distance ordering)
    hamming      = popcount(q XOR x) via +/- 1 matmul over bits

Precision policy (reference ApproxMode {Fast, Normal, Accurate},
lib.rs:299-307): "float32" uses XLA's high-precision f32 matmul
(exact results for brute-force scans), "bfloat16" runs the MXU at full
rate for approximate search where the index already bounds recall.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .util import matmul_dtype

VALID_METRICS = ("l2", "cosine", "dot", "hamming")


def normalize_metric(metric: str) -> str:
    m = metric.lower().strip()
    aliases = {"euclidean": "l2", "cos": "cosine", "inner_product": "dot", "ip": "dot"}
    m = aliases.get(m, m)
    if m not in VALID_METRICS:
        raise ValueError(f"unknown distance metric {metric!r}; expected one of {VALID_METRICS}")
    return m


def _matmul(q: jax.Array, x: jax.Array, precision: str) -> jax.Array:
    """q (Q, D) @ x.T (D, N) with the requested precision policy."""
    if precision == "bfloat16":
        return jnp.dot(
            q.astype(matmul_dtype()),
            x.astype(matmul_dtype()).T,
            preferred_element_type=jnp.float32,
        )
    return jnp.dot(q, x.T, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)


def squared_norms(x: jax.Array) -> jax.Array:
    return jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1)


@partial(jax.jit, static_argnames=("metric", "precision"))
def pairwise_distance(
    q: jax.Array,
    x: jax.Array,
    metric: str = "l2",
    precision: str = "float32",
    x_norms: jax.Array | None = None,
) -> jax.Array:
    """Dense (Q, N) distance matrix between query rows and database rows.

    ``x_norms`` — optional precomputed |x|^2 (l2) or |x| (cosine); index
    structures cache these so the scan does one matmul + one add.
    """
    metric = normalize_metric(metric)
    if metric == "hamming":
        return hamming_distance(q, x)
    qf = q.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    dots = _matmul(qf, xf, precision)
    if metric == "dot":
        return -dots
    if metric == "cosine":
        qn = jnp.sqrt(squared_norms(qf))[:, None]
        xn = jnp.sqrt(squared_norms(xf))[None, :] if x_norms is None else x_norms[None, :]
        denom = jnp.maximum(qn * xn, 1e-30)
        return 1.0 - dots / denom
    # l2 (squared)
    qn2 = squared_norms(qf)[:, None]
    xn2 = squared_norms(xf)[None, :] if x_norms is None else x_norms[None, :]
    d = qn2 - 2.0 * dots + xn2
    return jnp.maximum(d, 0.0)


@jax.jit
def hamming_distance(q: jax.Array, x: jax.Array) -> jax.Array:
    """Hamming distance for binary vectors packed in uint8.

    Bits are unpacked to ±1 and the XOR popcount becomes a matmul:
    popcount(a ^ b) = (nbits - a±1 · b±1) / 2 — MXU-friendly, no
    per-element popcount loop.
    """
    qb = _unpack_bits_pm1(q)
    xb = _unpack_bits_pm1(x)
    nbits = qb.shape[-1]
    dots = jnp.dot(qb, xb.T, preferred_element_type=jnp.float32)
    return (nbits - dots) * 0.5


def _unpack_bits_pm1(packed: jax.Array) -> jax.Array:
    """uint8 (N, B) → bfloat16 (N, 8B) in {-1, +1}."""
    n, b = packed.shape
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint8(1)
    bits = bits.reshape(n, b * 8)
    return (bits.astype(matmul_dtype()) * 2.0) - 1.0


@partial(jax.jit, static_argnames=("metric",))
def refine_distances(
    q: jax.Array, candidates: jax.Array, metric: str = "l2"
) -> jax.Array:
    """Exact per-candidate distances for the refine/rerank step.

    q: (Q, D); candidates: (Q, K, D) gathered full-precision vectors.
    Returns (Q, K) f32 distances (reference refine_factor rerank,
    SURVEY.md §3.2 "refine_factor exact rerank").
    """
    metric = normalize_metric(metric)
    qf = q.astype(jnp.float32)
    cf = candidates.astype(jnp.float32)
    dots = jnp.einsum("qd,qkd->qk", qf, cf, precision=jax.lax.Precision.HIGHEST)
    if metric == "dot":
        return -dots
    if metric == "cosine":
        qn = jnp.sqrt(squared_norms(qf))[:, None]
        cn = jnp.sqrt(jnp.sum(jnp.square(cf), axis=-1))
        return 1.0 - dots / jnp.maximum(qn * cn, 1e-30)
    qn2 = squared_norms(qf)[:, None]
    cn2 = jnp.sum(jnp.square(cf), axis=-1)
    return jnp.maximum(qn2 - 2.0 * dots + cn2, 0.0)
