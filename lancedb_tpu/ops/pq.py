"""Product quantization: codebook training, encoding, and the ADC scan
— formulated so the MXU does all the work.

Reference behavior being matched (built in lance crates, SURVEY.md
§2.9): PQ codebooks trained by per-subvector k-means (256 centroids,
default num_sub_vectors = dim/16 — index/vector.rs:306-319), vectors
encoded per subvector, queries scanned with asymmetric distance
computation (ADC).

TPU-first design decisions:

* Training is one vmapped Lloyd program over all subvectors — a single
  batched matmul per iteration, not num_sub_vectors sequential k-means.
* The scan does NOT use scalar LUT gathers (poison on the VPU).
  Instead codes are dequantized on the fly with a one-hot einsum that
  lowers to a bf16 MXU matmul, and the ADC distance is the exact same
  LUT sum expressed as `lut[q,s,:] · onehot(code)`:
      d(q, x̃) = Σ_s ||q_s - C_s[code_s]||²
  For residual IVF_PQ the identity
      d(q, x̃) = ||q||² − 2·(q·c_p + q·r̃) + ||c_p + r̃||²
  lets us reuse the query×centroid matmul from partition selection and
  a stored per-row ||x̃||² term, so the per-candidate work is one
  dequantize-matmul — no per-(query, partition) LUT materialization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .util import matmul_dtype
from .kmeans import kmeans_fit_device, kmeanspp_init_device


def default_num_sub_vectors(dim: int) -> int:
    """Reference default: dim/16 if divisible, else dim/8, else 1
    (index/vector.rs:306-319)."""
    if dim % 16 == 0:
        return dim // 16
    if dim % 8 == 0:
        return dim // 8
    return 1


def _split_subvectors(data: np.ndarray, nsub: int) -> np.ndarray:
    """(N, D) → (nsub, N, dsub)."""
    n, d = data.shape
    if d % nsub != 0:
        raise ValueError(f"dim {d} not divisible by num_sub_vectors {nsub}")
    dsub = d // nsub
    return np.ascontiguousarray(data.reshape(n, nsub, dsub).transpose(1, 0, 2))


def pq_train(
    data: np.ndarray,
    num_sub_vectors: int,
    num_bits: int = 8,
    max_iters: int = 50,
    sample_rate: int = 256,
    seed: int = 0,
) -> np.ndarray:
    """Train codebooks → (nsub, 2^bits, dsub) f32.

    All subvector k-means run as ONE vmapped device program.
    """
    if num_bits not in (4, 8):
        raise ValueError("num_bits must be 4 or 8")
    k = 1 << num_bits
    data = np.asarray(data, dtype=np.float32)
    n = data.shape[0]
    rng = np.random.default_rng(seed)
    max_sample = sample_rate * k
    if n > max_sample:
        sel = rng.choice(n, size=max_sample, replace=False)
        data = data[sel]
        n = data.shape[0]
    if n < k:
        # tiny table: oversample with replacement so every codebook still
        # has 2^bits entries (duplicate centroids are harmless — encode
        # picks the first argmin)
        extra = rng.integers(0, n, size=k - n)
        data = np.concatenate([data, data[extra]])
        n = data.shape[0]
    subs = _split_subvectors(data, num_sub_vectors)  # (S, N, dsub)
    # k-means++ seeding per subvector, vmapped into one device program
    pool_n = min(n, 32 * k)
    pool_ids = rng.choice(n, size=pool_n, replace=False)
    keys = jax.random.split(jax.random.PRNGKey(seed), num_sub_vectors)
    inits = jax.vmap(lambda xs, kk: kmeanspp_init_device(xs, kk, k=k))(
        jnp.asarray(subs[:, pool_ids]), keys
    )  # (S, K, dsub)
    reseed = rng.integers(0, n, size=(max_iters, k), dtype=np.int32)

    fit = jax.vmap(
        lambda x, c: kmeans_fit_device(
            x, c, jnp.asarray(reseed), k=k, max_iters=max_iters, metric="l2"
        )[0]
    )
    codebooks = fit(jnp.asarray(subs), jnp.asarray(inits))
    return np.asarray(codebooks)


@jax.jit
def _encode_device(subs: jax.Array, codebooks: jax.Array) -> jax.Array:
    """subs: (S, N, dsub); codebooks: (S, K, dsub) → codes (N, S) uint8."""

    def one(x, c):
        xb = x.astype(matmul_dtype())
        cb = c.astype(matmul_dtype())
        dots = jnp.dot(xb, cb.T, preferred_element_type=jnp.float32)
        cn2 = jnp.sum(jnp.square(c.astype(jnp.float32)), axis=-1)
        d = cn2[None, :] - 2.0 * dots  # |x|^2 constant per row — argmin unaffected
        return jnp.argmin(d, axis=-1)

    codes = jax.vmap(one)(subs, codebooks)  # (S, N)
    return codes.T.astype(jnp.uint8)


def pq_encode(
    data: np.ndarray, codebooks: np.ndarray, block_rows: int = 1 << 17
) -> np.ndarray:
    """Encode rows → (N, nsub) uint8 codes (blocked over rows)."""
    data = np.asarray(data, dtype=np.float32)
    nsub = codebooks.shape[0]
    cb = jnp.asarray(codebooks)
    out = np.empty((data.shape[0], nsub), dtype=np.uint8)
    for start in range(0, data.shape[0], block_rows):
        block = data[start : start + block_rows]
        subs = jnp.asarray(_split_subvectors(block, nsub))
        out[start : start + len(block)] = np.asarray(_encode_device(subs, cb))
    return out


@partial(jax.jit, static_argnames=("out_dtype",))
def pq_reconstruct_device(
    codes: jax.Array, codebooks: jax.Array, out_dtype=None
) -> jax.Array:
    """Dequantize codes → (N, D) via one-hot einsum (MXU matmul).

    codes: (N, S) uint8; codebooks: (S, K, dsub).
    """
    if out_dtype is None:
        out_dtype = matmul_dtype()
    k = codebooks.shape[1]
    oh = jax.nn.one_hot(codes.astype(jnp.int32), k, dtype=matmul_dtype())  # (N, S, K)
    recon = jnp.einsum(
        "nsk,skd->nsd", oh, codebooks.astype(matmul_dtype()), preferred_element_type=jnp.float32
    )
    n = codes.shape[0]
    return recon.reshape(n, -1).astype(out_dtype)


def pq_reconstruct(codes: np.ndarray, codebooks: np.ndarray, block_rows: int = 1 << 16) -> np.ndarray:
    cb = jnp.asarray(codebooks)
    out = np.empty((codes.shape[0], codebooks.shape[0] * codebooks.shape[2]), dtype=np.float32)
    for start in range(0, codes.shape[0], block_rows):
        blk = jnp.asarray(codes[start : start + block_rows])
        out[start : start + blk.shape[0]] = np.asarray(
            pq_reconstruct_device(blk, cb, out_dtype=jnp.float32)
        )
    return out


@partial(jax.jit, static_argnames=("chunk", "has_rotation", "from_raw"))
def _encode_rnorms_device(
    residuals, cents, assign, codebooks, rotation, chunk: int,
    has_rotation: bool, from_raw: bool = False
):
    """Fused encode + reconstruct + |x̂|² in one device program, blocked
    over row chunks (lax.map) so transients stay bounded. Inputs stay
    resident — no host round trips inside the build loop.

    residuals: (N_pad, D); cents: (P, D); assign: (N_pad,) int32;
    rotation: (D, D) or (1, 1) placeholder. Returns (codes (N_pad, S)
    uint8, rnorms (N_pad,) f32) where rnorms = |c_assign + r̂|².

    from_raw: the first argument holds RAW vectors, not residuals —
    each chunk subtracts its coarse centroid in-register. This is the
    capacity mode: a 30M x 128 build cannot hold the bf16 table AND a
    bf16 residual buffer next to it in 16 GB HBM (7.7 GB each), and the
    centroid gather was already paid for the |x̂|² reconstruction.
    """
    n, d = residuals.shape
    nsub, kcode, dsub = codebooks.shape
    cb = codebooks.astype(jnp.float32)
    cn2 = jnp.sum(jnp.square(cb), axis=-1)  # (S, K)

    def one_chunk(args):
        res, asg = args  # (c, D), (c,)
        if from_raw:
            res = res.astype(jnp.float32) - jnp.take(cents, asg, axis=0)
        x = res @ rotation.T if has_rotation else res  # rotated residuals
        xs = x.reshape(-1, nsub, dsub)  # (c, S, dsub)
        dots = jnp.einsum(
            "csd,skd->csk", xs.astype(matmul_dtype()), cb.astype(matmul_dtype()),
            preferred_element_type=jnp.float32,
        )
        codes = jnp.argmin(cn2[None] - 2.0 * dots, axis=-1)  # (c, S)
        oh = jax.nn.one_hot(codes, kcode, dtype=matmul_dtype())
        recon = jnp.einsum(
            "csk,skd->csd", oh, cb.astype(matmul_dtype()),
            preferred_element_type=jnp.float32,
        ).reshape(-1, d)
        if has_rotation:
            recon = recon @ rotation
        xhat = recon + jnp.take(cents, asg, axis=0)
        return codes.astype(jnp.uint8), jnp.sum(jnp.square(xhat), axis=-1)

    res_c = residuals.reshape(n // chunk, chunk, d)
    asg_c = assign.reshape(n // chunk, chunk)
    codes, rnorms = jax.lax.map(one_chunk, (res_c, asg_c))
    return codes.reshape(n, nsub), rnorms.reshape(n)


def pq_encode_rnorms(
    residuals_dev: jax.Array,
    cents_dev: jax.Array,
    assign_dev: jax.Array,
    codebooks: np.ndarray,
    rotation: np.ndarray | None = None,
    chunk: int = 1 << 17,
) -> tuple[np.ndarray, np.ndarray]:
    """Device-resident encode+rnorms for the index build hot path."""
    n = residuals_dev.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad != n:
        residuals_dev = jnp.pad(residuals_dev, ((0, n_pad - n), (0, 0)))
        assign_dev = jnp.pad(assign_dev, (0, n_pad - n))
    rot = jnp.asarray(rotation) if rotation is not None else jnp.zeros((1, 1), jnp.float32)
    codes, rnorms = _encode_rnorms_device(
        residuals_dev, cents_dev, assign_dev.astype(jnp.int32), jnp.asarray(codebooks),
        rot, chunk=min(chunk, n_pad), has_rotation=rotation is not None,
    )
    return np.asarray(codes[:n]), np.asarray(rnorms[:n])


@partial(
    jax.jit,
    static_argnames=("nsub", "kcode", "max_iters", "chunk", "has_rotation",
                     "from_raw"),
)
def pq_build_device(
    residuals: jax.Array,
    cents: jax.Array,
    assign: jax.Array,
    sel: jax.Array,
    pool_sel: jax.Array,
    keys: jax.Array,
    reseed: jax.Array,
    rotation: jax.Array,
    *,
    nsub: int,
    kcode: int,
    max_iters: int = 50,
    chunk: int = 1 << 17,
    has_rotation: bool = False,
    from_raw: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The whole PQ stage as ONE device program: codebook-sample gather →
    per-subvector k-means++ + Lloyd (vmapped) → fused encode+|x̂|².

    ``from_raw=True``: the first argument holds RAW vectors; residuals
    are formed in-register per chunk (and per training row) instead of
    living as a second (N, D) buffer — see _encode_rnorms_device.

    Companion to ops.kmeans.ivf_train_assign_device — one compile-queue
    draw instead of four, and the residual training sample never leaves
    the device (it used to round-trip ~33 MB through the ~19 MB/s
    tunnel).

    residuals: (N_pad, D) f32 (device-resident, from the coarse stage)
    cents:     (K, D) f32 coarse centroids
    assign:    (N_pad,) int32
    sel:       (n_train,) int32 codebook-training row ids (< N live rows)
    pool_sel:  (n_pool,) int32 ids into the training sample for seeding
    keys:      (nsub, 2) PRNG keys, one per subvector
    reseed:    (max_iters, kcode) int32, shared across subvectors
    rotation:  (D, D) f32 or (1, 1) placeholder when has_rotation=False
    Returns (codebooks (S, K, dsub) f32, codes (N_pad, S) uint8,
    rnorms (N_pad,) f32).
    """
    d = residuals.shape[1]
    dsub = d // nsub
    # residuals may arrive bf16 (large-D builds halve the buffer);
    # codebook training accumulates in f32 regardless
    sample = jnp.take(residuals, sel, axis=0).astype(jnp.float32)
    if from_raw:
        sample = sample - jnp.take(cents, jnp.take(assign, sel), axis=0)
    if has_rotation:
        sample = sample @ rotation.T
    subs = sample.reshape(-1, nsub, dsub).transpose(1, 0, 2)  # (S, n, dsub)
    pools = jnp.take(subs, pool_sel, axis=1)
    inits = jax.vmap(lambda xs, kk: kmeanspp_init_device(xs, kk, k=kcode))(pools, keys)
    codebooks = jax.vmap(
        lambda xx, cc: kmeans_fit_device(
            xx, cc, reseed, k=kcode, max_iters=max_iters, metric="l2"
        )[0]
    )(subs, inits)
    codes, rnorms = _encode_rnorms_device(
        residuals, cents, assign, codebooks, rotation,
        chunk=min(chunk, residuals.shape[0]), has_rotation=has_rotation,
        from_raw=from_raw,
    )
    return codebooks, codes, rnorms


def opq_train(
    data: np.ndarray,
    num_sub_vectors: int,
    num_bits: int = 8,
    opq_iters: int = 8,
    max_iters: int = 50,
    sample_rate: int = 256,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """OPQ: learn an orthonormal rotation R that minimizes PQ
    reconstruction error, then train codebooks on rotated data.

    Alternating minimization (OPQ-NP, Ge et al. 2013): fix R → train
    short PQ on Y = X·Rᵀ; fix codes → orthogonal Procrustes
    R = U·Vᵀ from SVD(Ŷᵀ·X). Rotation balances variance across
    subvectors, which matters for real embeddings whose covariance
    spectrum is heavily skewed. The reference has no OPQ (lance PQ
    trains on raw residuals); this is a quality improvement knob.

    Returns (rotation (D, D) f32, codebooks (S, K, dsub) f32); encode
    with pq_encode(data @ rotation.T, codebooks).
    """
    k = 1 << num_bits
    data = np.asarray(data, dtype=np.float32)
    n, dim = data.shape
    rng = np.random.default_rng(seed)
    max_sample = sample_rate * k
    if n > max_sample:
        data = data[rng.choice(n, size=max_sample, replace=False)]
    rot = np.eye(dim, dtype=np.float32)
    xj = jnp.asarray(data)

    @jax.jit
    def _procrustes_m(yhat, x):
        return jnp.dot(yhat.T, x, preferred_element_type=jnp.float32)

    for t in range(opq_iters):
        y = np.asarray(jnp.dot(xj, jnp.asarray(rot.T)))
        cb = pq_train(
            y, num_sub_vectors, num_bits=num_bits,
            max_iters=min(10, max_iters), sample_rate=sample_rate, seed=seed + t,
        )
        codes = pq_encode(y, cb)
        yhat = pq_reconstruct(codes, cb)
        m = np.asarray(_procrustes_m(jnp.asarray(yhat), xj))
        u, _, vt = np.linalg.svd(m.astype(np.float64))
        rot = (u @ vt).astype(np.float32)
    y = np.asarray(jnp.dot(xj, jnp.asarray(rot.T)))
    codebooks = pq_train(
        y, num_sub_vectors, num_bits=num_bits,
        max_iters=max_iters, sample_rate=sample_rate, seed=seed,
    )
    return rot, codebooks


@jax.jit
def adc_lut(queries: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Classic ADC lookup tables: (Q, S, K) of ||q_s − C_s[k]||².

    Kept for plain (non-residual) PQ scans and for testing the matmul
    formulation against the textbook one.
    """
    q = queries.astype(jnp.float32)
    nsub, k, dsub = codebooks.shape
    qs = q.reshape(q.shape[0], nsub, dsub)
    cb = codebooks.astype(jnp.float32)
    dots = jnp.einsum("qsd,skd->qsk", qs, cb, precision=jax.lax.Precision.HIGHEST)
    qn2 = jnp.sum(jnp.square(qs), axis=-1)  # (Q, S)
    cn2 = jnp.sum(jnp.square(cb), axis=-1)  # (S, K)
    return qn2[:, :, None] - 2.0 * dots + cn2[None, :, :]


@jax.jit
def adc_scan_lut(luts: jax.Array, codes: jax.Array) -> jax.Array:
    """LUT-sum ADC via one-hot contraction: luts (Q, S, K) × codes (N, S)
    → distances (Q, N). Lowers to a bf16 batched matmul over S."""
    k = luts.shape[-1]
    oh = jax.nn.one_hot(codes.astype(jnp.int32), k, dtype=matmul_dtype())  # (N, S, K)
    return jnp.einsum("qsk,nsk->qn", luts.astype(matmul_dtype()), oh, preferred_element_type=jnp.float32)
