"""Top-k selection without dynamic shapes.

Three tiers matching the reference's ApproxMode (lib.rs:299-307):

* exact       — jax.lax.top_k (full sort network, bit-exact)
* approx      — jax.lax.approx_max_k, the TPU-native partial-reduce
                top-k (runs at near-streaming speed on the VPU)
* blocked     — lax.scan over database blocks with a running k-best
                merge: memory O(Q·block) instead of O(Q·N), the
                streaming-top-k design from SURVEY.md §7

All return SMALLEST distances (we negate internally for max-k prims).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .util import INF


@partial(jax.jit, static_argnames=("k",))
def topk_smallest(dists: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact k smallest along the last axis → (values, indices)."""
    neg_vals, idx = jax.lax.top_k(-dists, k)
    return -neg_vals, idx


@partial(jax.jit, static_argnames=("k", "recall_target"))
def approx_topk_smallest(
    dists: jax.Array, k: int, recall_target: float = 0.99
) -> tuple[jax.Array, jax.Array]:
    """TPU-native approximate k smallest (lax.approx_max_k on negated)."""
    neg_vals, idx = jax.lax.approx_max_k(-dists, k, recall_target=recall_target)
    return -neg_vals, idx


def merge_topk(
    vals_a: jax.Array, idx_a: jax.Array, vals_b: jax.Array, idx_b: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Merge two (…, k') candidate sets into the k smallest.

    Used for the running merge in blocked scans and for the cross-device
    all-gather merge (per-shard top-k → global top-k, SURVEY.md §2.7).
    """
    vals = jnp.concatenate([vals_a, vals_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    neg_vals, pos = jax.lax.top_k(-vals, k)
    return -neg_vals, jnp.take_along_axis(idx, pos, axis=-1)


def blocked_topk_scan(
    score_block,
    num_blocks: int,
    k: int,
    q_rows: int,
    exact: bool = True,
    recall_target: float = 0.99,
):
    """Streaming top-k over a blocked scan.

    ``score_block(i) -> (dists (Q, B), ids (Q, B) or (B,))`` computes one
    block's distances; this scans blocks keeping a running k-best. Static
    block count, static shapes — one XLA while loop, no recompiles.
    """

    select = (
        (lambda d: topk_smallest(d, k))
        if exact
        else (lambda d: approx_topk_smallest(d, k, recall_target))
    )

    def body(carry, i):
        best_vals, best_ids = carry
        dists, ids = score_block(i)
        blk_vals, blk_pos = select(dists)
        if ids.ndim == 1:
            blk_ids = ids[blk_pos]
        else:
            blk_ids = jnp.take_along_axis(ids, blk_pos, axis=-1)
        new_vals, new_ids = merge_topk(best_vals, best_ids, blk_vals, blk_ids, k)
        return (new_vals, new_ids), None

    init = (
        jnp.full((q_rows, k), INF, dtype=jnp.float32),
        jnp.full((q_rows, k), -1, dtype=jnp.int64),
    )
    (vals, ids), _ = jax.lax.scan(body, init, jnp.arange(num_blocks))
    return vals, ids


@partial(jax.jit, static_argnames=("k",))
def mask_and_topk(
    dists: jax.Array, valid: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Top-k with an invalid-row mask (padding / deletions / prefilter):
    invalid entries get +inf so they never surface."""
    masked = jnp.where(valid, dists, INF)
    return topk_smallest(masked, k)
