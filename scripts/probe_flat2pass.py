"""Dissect the flat 2-pass scan (the bench headline): where do the
~2.6 ms/batch go, and does candidate-id sorting / hi-lo bf16 rescore /
smaller kc speed the rescore leg?"""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from functools import partial

N, D, Q, K = 1_000_000, 128, 256, 10
rng = np.random.default_rng(0)
x = rng.standard_normal((N, D)).astype(np.float32)
xj = jnp.asarray(x)
xb = xj.astype(jnp.bfloat16)
xlo = (xj - xb.astype(jnp.float32)).astype(jnp.bfloat16)  # residual
xn2 = jnp.sum(jnp.square(xj), axis=1)
q = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))


def bench(label, fn, *args, reps=20):
    o = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1000:.3f} ms/batch  ({Q/dt:.0f} qps)", flush=True)
    return o


@partial(jax.jit, static_argnames=("kc",))
def coarse_only(q, xb, xn2, kc):
    dots = jnp.dot(q.astype(jnp.bfloat16), xb.T, preferred_element_type=jnp.float32)
    d = jnp.sum(jnp.square(q), 1, keepdims=True) - 2.0 * dots + xn2[None, :]
    return jax.lax.approx_max_k(-d, kc)


@partial(jax.jit, static_argnames=("kc", "sort_ids", "hilo"))
def two_pass(q, xj, xb, xlo, xn2, kc, sort_ids, hilo):
    dots = jnp.dot(q.astype(jnp.bfloat16), xb.T, preferred_element_type=jnp.float32)
    qf = q.astype(jnp.float32)
    qn2 = jnp.sum(jnp.square(qf), 1, keepdims=True)
    d = qn2 - 2.0 * dots + xn2[None, :]
    _, cand = jax.lax.approx_max_k(-d, kc)
    if sort_ids:
        cand = jnp.sort(cand, axis=1)
    if hilo:
        qb = qf.astype(jnp.bfloat16)
        hi = jnp.take(xb, cand, axis=0)
        lo = jnp.take(xlo, cand, axis=0)
        dot2 = (jnp.einsum("qd,qcd->qc", qb, hi, preferred_element_type=jnp.float32)
                + jnp.einsum("qd,qcd->qc", qb, lo, preferred_element_type=jnp.float32))
        d2 = qn2 - 2.0 * dot2 + jnp.take(xn2, cand)
    else:
        xc = jnp.take(xj, cand, axis=0)
        d2 = jnp.sum(jnp.square(qf[:, None, :] - xc), axis=-1)
    negv, pos = jax.lax.top_k(-d2, K)
    return -negv, jnp.take_along_axis(cand, pos, axis=1)


bench("coarse+approxk80 only", coarse_only, q, xb, xn2, 80)
r0 = bench("2-pass f32 kc=80 (current)", two_pass, q, xj, xb, xlo, xn2, 80, False, False)
r1 = bench("2-pass f32 kc=80 sorted-ids", two_pass, q, xj, xb, xlo, xn2, 80, True, False)
r2 = bench("2-pass hilo kc=80", two_pass, q, xj, xb, xlo, xn2, 80, False, True)
r3 = bench("2-pass hilo kc=80 sorted", two_pass, q, xj, xb, xlo, xn2, 80, True, True)
r4 = bench("2-pass f32 kc=48 sorted", two_pass, q, xj, xb, xlo, xn2, 48, True, False)

# recall check vs exact
qh = np.asarray(q[:64])
dfull = (qh * qh).sum(1)[:, None] - 2.0 * (qh @ x.T) + (x * x).sum(1)[None, :]
gt = np.argpartition(dfull, K, axis=1)[:, :K]
for tag, r in (("current", r0), ("hilo-sorted", r3), ("kc48", r4)):
    ids = np.asarray(r[1])[:64]
    rec = np.mean([len(set(ids[i]) & set(gt[i])) / K for i in range(64)])
    print(f"recall {tag}: {rec:.4f}", flush=True)
