"""Batched k-means (Lloyd) on the MXU.

The reference trains IVF coarse quantizers with sampled k-means
(sample_rate=256 rows per centroid, max 50 iterations —
index/vector.rs:76-108) inside the lance crates, on CPU SIMD or via a
GPU `accelerator`. Here both halves of a Lloyd iteration are matmuls:

  assign:  argmin_c ||x - c||^2  → one (N, D)x(D, K) matmul + argmin
  update:  C' = onehot(assign)ᵀ X / counts → one (K, N)x(N, D) matmul

so the whole trainer runs at MXU rate under one jit. The assignment
matmul runs in bfloat16 (ranking argmin tolerates it; centroids are
averages so the update accumulates in f32). Empty clusters are
reseeded from data rows, matching the usual FAISS/lance recovery.

Everything is shape-static: fixed iteration count via lax.scan with a
convergence mask (no recompiles across datasets of the same shape).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .util import matmul_dtype
from .distance import normalize_metric


def _assign(x_b: jax.Array, x_n2: jax.Array, cents: jax.Array, metric: str) -> jax.Array:
    """Nearest-centroid ids. x_b: (N, D) bf16; x_n2: (N,) f32 |x|^2."""
    c = cents.astype(matmul_dtype())
    dots = jnp.dot(x_b, c.T, preferred_element_type=jnp.float32)  # (N, K)
    if metric == "cosine" or metric == "dot":
        # spherical: centroids renormalized each iter → argmax dot
        return jnp.argmax(dots, axis=-1)
    cn2 = jnp.sum(jnp.square(cents), axis=-1)  # (K,)
    d = x_n2[:, None] - 2.0 * dots + cn2[None, :]
    return jnp.argmin(d, axis=-1)


def _update(x_b: jax.Array, assign: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """One-hot-matmul centroid update. Returns (sums (K, D) f32, counts (K,) f32)."""
    onehot = jax.nn.one_hot(assign, k, dtype=matmul_dtype())  # exact in bf16
    sums = jnp.dot(onehot.T, x_b, preferred_element_type=jnp.float32)
    counts = jnp.sum(onehot.astype(jnp.float32), axis=0)
    return sums, counts


@partial(jax.jit, static_argnames=("k", "max_iters", "metric"))
def kmeans_fit_device(
    x: jax.Array,
    init_centroids: jax.Array,
    reseed_rows: jax.Array,
    k: int,
    max_iters: int = 50,
    metric: str = "l2",
    tol: float = 1e-4,
) -> tuple[jax.Array, jax.Array]:
    """Run Lloyd iterations on device.

    x:              (N, D) float32 training sample
    init_centroids: (K, D) float32
    reseed_rows:    (max_iters, K) int32 random row ids for empty-cluster
                    recovery (precomputed host-side: no device RNG state)
    Returns (centroids (K, D) f32, final assignment (N,) int32).
    """
    spherical = metric in ("cosine", "dot")
    xf = x.astype(jnp.float32)
    if spherical:
        xf = xf / jnp.maximum(jnp.linalg.norm(xf, axis=-1, keepdims=True), 1e-30)
    x_b = xf.astype(matmul_dtype())
    x_n2 = jnp.sum(jnp.square(xf), axis=-1)

    def renorm(c):
        if spherical:
            return c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-30)
        return c

    def body(carry, it):
        cents, done = carry
        assign = _assign(x_b, x_n2, cents, metric)
        sums, counts = _update(x_b, assign, k)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        # empty clusters: reseed from random data rows this iteration
        reseed = xf[reseed_rows[it]]
        new = jnp.where((counts > 0)[:, None], new, reseed)
        new = renorm(new)
        shift = jnp.max(jnp.sum(jnp.square(new - cents), axis=-1))
        new_done = jnp.logical_or(done, shift < tol)
        # freeze once converged (keeps scan shape-static, skips no work
        # but avoids drift; XLA still executes — fine, iters are cheap)
        out = jnp.where(done, cents, new)
        return (out, new_done), None

    init = (renorm(init_centroids.astype(jnp.float32)), jnp.bool_(False))
    (cents, _), _ = jax.lax.scan(body, init, jnp.arange(max_iters))
    final_assign = _assign(x_b, x_n2, cents, metric).astype(jnp.int32)
    return cents, final_assign


@partial(jax.jit, static_argnames=("k",))
def kmeanspp_init_device(x: jax.Array, key: jax.Array, k: int) -> jax.Array:
    """k-means++ seeding as one lax.scan on device.

    Each step extends the running min-distance array with the newest
    centroid and samples the next one ∝ D² via the Gumbel-max trick —
    no host round-trips, fully seeded/deterministic.
    """
    n = x.shape[0]
    xf = x.astype(jnp.float32)
    x_n2 = jnp.sum(jnp.square(xf), axis=-1)
    k0, kg = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    gumbels = jax.random.gumbel(kg, (k, n), dtype=jnp.float32)

    def body(carry, it):
        min_d2, prev_idx = carry
        c = xf[prev_idx]
        d2 = x_n2 - 2.0 * (xf @ c) + jnp.sum(jnp.square(c))
        min_d2 = jnp.minimum(min_d2, jnp.maximum(d2, 0.0))
        logits = jnp.where(min_d2 > 0, jnp.log(jnp.maximum(min_d2, 1e-30)), -jnp.inf)
        nxt = jnp.argmax(logits + gumbels[it])
        return (min_d2, nxt), prev_idx

    (_, last), idxs = jax.lax.scan(
        body, (jnp.full((n,), jnp.inf, dtype=jnp.float32), first), jnp.arange(k)
    )
    return xf[idxs]


def kmeans_fit(
    data: np.ndarray,
    k: int,
    metric: str = "l2",
    max_iters: int = 50,
    sample_rate: int = 256,
    seed: int = 0,
    tol: float = 1e-4,
    init: str = "kmeans++",
) -> np.ndarray:
    """Host entry: sample, init, train on device. Returns (K, D) f32.

    Sampling mirrors the reference defaults: at most sample_rate × k
    training rows (index/vector.rs:286-298). Initialization is
    k-means++ on a subsample (≤32 rows/centroid) — better partition
    balance than random init at negligible build cost.
    """
    metric = normalize_metric(metric)
    # device arrays stay resident (index builds upload the table once and
    # run every stage on-device); numpy input keeps the old behavior
    on_device = isinstance(data, jax.Array)
    if not on_device:
        data = np.asarray(data, dtype=np.float32)
    n = data.shape[0]
    if n < k:
        raise ValueError(f"need at least k={k} rows to train k-means, got {n}")
    rng = np.random.default_rng(seed)
    max_sample = sample_rate * k
    if n > max_sample:
        sel = rng.choice(n, size=max_sample, replace=False)
        sample = data[jnp.asarray(sel)] if on_device else data[sel]
    else:
        sample = data
    if init == "kmeans++":
        init_pool_size = min(sample.shape[0], max(32 * k, 4 * k))
        if init_pool_size >= sample.shape[0]:
            pool = sample
        else:
            pool_ids = rng.choice(sample.shape[0], size=init_pool_size, replace=False)
            pool = sample[jnp.asarray(pool_ids)] if on_device else sample[pool_ids]
        pool = jnp.asarray(pool, dtype=jnp.float32)
        if metric in ("cosine", "dot"):
            pool = pool / jnp.maximum(jnp.linalg.norm(pool, axis=-1, keepdims=True), 1e-30)
        init_centroids = kmeanspp_init_device(pool, jax.random.PRNGKey(seed), k=k)
    else:
        init_ids = rng.choice(sample.shape[0], size=k, replace=False)
        init_centroids = jnp.asarray(
            sample[jnp.asarray(init_ids)] if on_device else sample[init_ids],
            dtype=jnp.float32,
        )
    reseed = rng.integers(0, sample.shape[0], size=(max_iters, k), dtype=np.int32)
    cents, _ = kmeans_fit_device(
        jnp.asarray(sample, dtype=jnp.float32),
        init_centroids,
        jnp.asarray(reseed),
        k=k,
        max_iters=max_iters,
        metric=metric,
        tol=tol,
    )
    return np.asarray(cents)


@partial(jax.jit, static_argnames=("metric", "chunk", "with_residuals", "residual_dtype"))
def assign_residuals_device(
    x: jax.Array,
    cents: jax.Array,
    metric: str = "l2",
    chunk: int = 1 << 17,
    with_residuals: bool = True,
    residual_dtype: str = "float32",
):
    """Blocked device assign (+ residuals): x stays resident, the (c, K)
    distance transient is bounded by the chunk size. x must be padded to
    a chunk multiple by the caller. Returns (assign int32, residuals).

    The f32 cast/normalize happens INSIDE each chunk — a full-table f32
    copy of a bf16 input would double resident HBM (at 1M x 960 that
    copy alone is 3.8 GB). residual_dtype="bfloat16" halves the residual
    buffer for large-D builds; PQ code selection is unaffected at that
    precision and rnorms reconstruct from codebooks, not residuals."""
    n, d = x.shape
    spherical = metric in ("cosine", "dot")
    res_dt = jnp.bfloat16 if residual_dtype == "bfloat16" else jnp.float32

    def one_chunk(xc):
        xc = xc.astype(jnp.float32)
        if spherical:
            xc = xc / jnp.maximum(jnp.linalg.norm(xc, axis=-1, keepdims=True), 1e-30)
        a = _assign(xc.astype(matmul_dtype()), jnp.sum(jnp.square(xc), -1), cents, metric)
        a = a.astype(jnp.int32)
        if with_residuals:
            return a, (xc - jnp.take(cents, a, axis=0)).astype(res_dt)
        return a, jnp.zeros((xc.shape[0], 0), res_dt)

    assign, res = jax.lax.map(one_chunk, x.reshape(n // chunk, chunk, d))
    return assign.reshape(n), res.reshape(n, -1)


@partial(
    jax.jit,
    static_argnames=("k", "max_iters", "metric", "chunk", "with_residuals", "residual_dtype"),
)
def ivf_train_assign_device(
    x: jax.Array,
    sel: jax.Array,
    pool_sel: jax.Array,
    key: jax.Array,
    reseed: jax.Array,
    *,
    k: int,
    max_iters: int = 50,
    metric: str = "l2",
    chunk: int = 1 << 17,
    with_residuals: bool = True,
    tol: float = 1e-4,
    residual_dtype: str = "float32",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The whole IVF coarse stage as ONE device program:

        sample gather → k-means++ seeding → Lloyd → full assign (+residuals)

    The axon tunnel charges a large, *highly variable* first-execution
    (remote compile) cost per program — fusing the five coarse-stage
    programs into one cuts the number of compile-queue draws an index
    build pays, and lets the caller warm this single program (zeros
    input, device-created so nothing crosses the tunnel) concurrently
    with the table upload. x may be bf16 (the assign matmul already is);
    everything downstream accumulates in f32.

    x:        (N, D) float32/bf16 — N need NOT be chunk-aligned (padded
              internally; pad rows get garbage assignments the caller
              slices off)
    sel:      (n_sample,) int32 training-sample row ids
    pool_sel: (n_pool,) int32 ids into the sample for k-means++ seeding
    reseed:   (max_iters, k) int32 empty-cluster reseed rows
    Returns (centroids (K, D) f32, assign (N_pad,) int32,
    residuals (N_pad, D) f32 — empty (N_pad, 0) if with_residuals=False).
    """
    metric = normalize_metric(metric)
    spherical = metric in ("cosine", "dot")
    sample = jnp.take(x, sel, axis=0).astype(jnp.float32)
    pool = jnp.take(sample, pool_sel, axis=0)
    if spherical:
        pool = pool / jnp.maximum(jnp.linalg.norm(pool, axis=-1, keepdims=True), 1e-30)
    init_c = kmeanspp_init_device(pool, key, k=k)
    cents, _ = kmeans_fit_device(
        sample, init_c, reseed, k=k, max_iters=max_iters, metric=metric, tol=tol
    )
    n = x.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk if n > chunk else n
    x_pad = jnp.pad(x, ((0, n_pad - n), (0, 0))) if n_pad != n else x
    assign, residuals = assign_residuals_device(
        x_pad, cents, metric=metric, chunk=min(chunk, n_pad),
        with_residuals=with_residuals, residual_dtype=residual_dtype,
    )
    return cents, assign, residuals


@partial(jax.jit, static_argnames=("metric",))
def kmeans_assign_device(x: jax.Array, cents: jax.Array, metric: str = "l2") -> jax.Array:
    spherical = metric in ("cosine", "dot")
    xf = x.astype(jnp.float32)
    if spherical:
        xf = xf / jnp.maximum(jnp.linalg.norm(xf, axis=-1, keepdims=True), 1e-30)
    return _assign(xf.astype(matmul_dtype()), jnp.sum(jnp.square(xf), -1), cents, metric).astype(
        jnp.int32
    )


def kmeans_assign(
    data: np.ndarray, centroids: np.ndarray, metric: str = "l2", block_rows: int = 1 << 18
) -> np.ndarray:
    """Blocked host wrapper: partition-assign a full dataset."""
    metric = normalize_metric(metric)
    data = np.asarray(data, dtype=np.float32)
    cents = jnp.asarray(centroids, dtype=jnp.float32)
    out = np.empty(data.shape[0], dtype=np.int32)
    for start in range(0, data.shape[0], block_rows):
        block = data[start : start + block_rows]
        out[start : start + len(block)] = np.asarray(
            kmeans_assign_device(jnp.asarray(block), cents, metric)
        )
    return out
