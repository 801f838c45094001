"""A/B kernel probes for the HNSW device build rewrite.

Times (on the real chip):
  1. current blocked_topk_scan kNN chunk vs fused two-pass (bf16 coarse +
     f32 rescore) kNN chunk
  2. current occlusion-prune chunk (middle-axis dynamic-slice scan) vs a
     transposed-layout scan vs a parallel relaxed-occlusion variant
"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from functools import partial

N = 125_000
D = 128
Q = 1024
K = 81  # kc+1 for layer0 (deg=40, kc=80) incl self

rng = np.random.default_rng(0)
nc = 1000
cents = rng.standard_normal((nc, D)).astype(np.float32) * 2
x = cents[rng.integers(0, nc, N)] + rng.standard_normal((N, D)).astype(np.float32)

pad_n = -(-N // 8192) * 8192
xb = jnp.asarray(np.pad(x, ((0, pad_n - N), (0, 0))))
xb_bf = xb.astype(jnp.bfloat16)
norms2 = jnp.sum(jnp.square(xb), axis=1)
valid = jnp.arange(pad_n) < N


def bench(fn, args, label, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1000:.1f} ms")
    return out, dt


# ---- 1. kNN chunk: fused two-pass --------------------------------------
@partial(jax.jit, static_argnames=("k", "kc2"))
def knn_two_pass(q_ids, k, kc2):
    q = jnp.take(xb, q_ids, axis=0)
    qn2 = jnp.sum(jnp.square(q), axis=1, keepdims=True)
    dots = jnp.dot(q.astype(jnp.bfloat16), xb_bf.T,
                   preferred_element_type=jnp.float32)
    d = qn2 - 2.0 * dots + norms2[None, :]
    d = jnp.where(valid[None, :], d, jnp.inf)
    _, cand = jax.lax.approx_max_k(-d, kc2, recall_target=0.95)
    xc = jnp.take(xb, cand, axis=0)  # (Q, kc2, D)
    d2 = jnp.sum(jnp.square(q[:, None, :] - xc), axis=-1)
    d2 = jnp.where(cand == q_ids[:, None], jnp.inf, d2)  # self-exclude
    negv, pos = jax.lax.top_k(-d2, k)
    return jnp.take_along_axis(cand, pos, axis=1), -negv


q_ids = jnp.arange(Q, dtype=jnp.int32)
(ids_tp, d_tp), dt = bench(knn_two_pass, (q_ids, K - 1, 2 * K), "knn two-pass chunk(1024)")
print(f"  -> full {N} rows est: {dt * N / Q:.1f} s")

# exactness check vs brute force on 64 queries
qh = x[:64]
dfull = ((qh[:, None, :] - x[None, :, :]) ** 2).sum(-1)
dfull[np.arange(64), np.arange(64)] = np.inf
gt = np.argsort(dfull, axis=1)[:, : K - 1]
got = np.asarray(ids_tp)[:64]
rec = np.mean([len(set(gt[i]) & set(got[i])) / (K - 1) for i in range(64)])
print(f"  knn recall vs exact: {rec:.4f}")

# ---- 2. prune chunk variants -------------------------------------------
C = 4096
KC = 400
cand = jnp.asarray(rng.integers(0, N, size=(C, KC)), dtype=jnp.int32)
node_ids = jnp.arange(C, dtype=jnp.int32)
DEG = 40


def prep(node_ids, cand_ids):
    u = jnp.take(xb, node_ids, axis=0)
    pad = cand_ids < 0
    cv = jnp.take(xb, jnp.maximum(cand_ids, 0), axis=0)
    d_uc = jnp.sum(jnp.square(u[:, None, :] - cv), axis=-1)
    d_uc = jnp.where(pad, jnp.inf, d_uc)
    sort = jnp.argsort(d_uc, axis=1)
    cand_ids = jnp.take_along_axis(cand_ids, sort, axis=1)
    cv = jnp.take_along_axis(cv, sort[:, :, None], axis=1)
    d_uc = jnp.take_along_axis(d_uc, sort, axis=1)
    cn2 = jnp.sum(jnp.square(cv), axis=-1)
    dots = jnp.einsum("cid,cjd->cij", cv, cv, preferred_element_type=jnp.float32)
    d_cc = jnp.maximum(cn2[:, :, None] - 2.0 * dots + cn2[:, None, :], 0.0)
    return cand_ids, d_uc, d_cc


@partial(jax.jit, static_argnames=("deg",))
def prune_current(node_ids, cand_ids, deg):
    kc = cand_ids.shape[1]
    cand_ids, d_uc, d_cc = prep(node_ids, cand_ids)

    def body(occl, j):
        ok = d_uc[:, j] <= occl[:, j]
        occl = jnp.minimum(occl, jnp.where(ok[:, None], d_cc[:, j, :], jnp.inf))
        return occl, ok

    _, oks = jax.lax.scan(body, jnp.full((cand_ids.shape[0], kc), jnp.inf), jnp.arange(kc))
    keep = oks.T
    key = jnp.where(keep, 0, kc) + jnp.arange(kc)[None, :]
    order = jnp.argsort(key, axis=1)[:, :deg]
    return jnp.take_along_axis(cand_ids, order, axis=1)


@partial(jax.jit, static_argnames=("deg",))
def prune_transposed(node_ids, cand_ids, deg):
    kc = cand_ids.shape[1]
    cand_ids, d_uc, d_cc = prep(node_ids, cand_ids)
    d_cc_t = jnp.transpose(d_cc, (1, 0, 2))  # (kc, c, kc): scan leading axis

    def body(occl, xs):
        duc_j, dcc_j, j = xs
        ok = duc_j <= occl[:, j]
        occl = jnp.minimum(occl, jnp.where(ok[:, None], dcc_j, jnp.inf))
        return occl, ok

    _, oks = jax.lax.scan(
        body, jnp.full((cand_ids.shape[0], kc), jnp.inf),
        (d_uc.T, d_cc_t, jnp.arange(kc)),
    )
    keep = oks.T
    key = jnp.where(keep, 0, kc) + jnp.arange(kc)[None, :]
    order = jnp.argsort(key, axis=1)[:, :deg]
    return jnp.take_along_axis(cand_ids, order, axis=1)


@partial(jax.jit, static_argnames=("deg",))
def prune_parallel(node_ids, cand_ids, deg):
    """Relaxed occlusion: candidate j occluded if ANY earlier candidate i
    (kept or not) has d_cc[i,j] <= d_uc[j]. Over-prunes vs the greedy
    chain; backfill keeps degree."""
    kc = cand_ids.shape[1]
    cand_ids, d_uc, d_cc = prep(node_ids, cand_ids)
    earlier = jnp.tril(jnp.ones((kc, kc), bool), k=-1)  # i < j
    occ = (d_cc <= d_uc[:, None, :]) & earlier[None, :, :]
    keep = ~jnp.any(occ, axis=1)
    key = jnp.where(keep, 0, kc) + jnp.arange(kc)[None, :]
    order = jnp.argsort(key, axis=1)[:, :deg]
    return jnp.take_along_axis(cand_ids, order, axis=1)


out_cur, dt_cur = bench(prune_current, (node_ids, cand, DEG), "prune current (kc=400)")
out_t, dt_t = bench(prune_transposed, (node_ids, cand, DEG), "prune transposed")
out_p, dt_p = bench(prune_parallel, (node_ids, cand, DEG), "prune parallel-relaxed")
same = np.mean(np.asarray(out_cur) == np.asarray(out_t))
overlap = np.mean([len(set(np.asarray(out_cur)[i]) & set(np.asarray(out_p)[i])) / DEG
                   for i in range(256)])
print(f"  transposed == current: {same:.4f}; parallel overlap: {overlap:.3f}")
print(f"  est prune total 125k 2 passes: cur {dt_cur*2*N/C:.0f}s t {dt_t*2*N/C:.0f}s p {dt_p*2*N/C:.0f}s")
