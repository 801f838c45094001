"""A/B the ADC inner formulation on real TPU at bench-like shapes:
  select: current K-chunked one-hot select loop
  gather: in-VMEM 128-lane dynamic_gather with split tables

Timing discipline: one jit wrapping a lax.scan with a data dependence
(carry perturbs the LUT), uint8 codes like the production kernel.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() == "tpu"

Q, NP = 128, 20
P, PMAX, PB = 1402, 1280, 256
NB = PMAX // PB
ncells = Q * NP
LANES = 128
REPS = 10


def make_select(S, K):
    def kern(dlut_ref, codes_ref, out_ref):
        codes = codes_ref[0].astype(jnp.int32)
        kc = min(K, 64) if K > 128 else K
        nc = K // kc
        acc = jnp.zeros((1, PB), jnp.float32)
        for ci in range(nc):
            lut = dlut_ref[0][:, ci * kc : (ci + 1) * kc]
            steps = jax.lax.broadcasted_iota(jnp.int32, (S, kc, PB), 1) + ci * kc
            hit = codes[:, None, :] == steps
            lut3 = jnp.broadcast_to(lut[:, :, None], (S, kc, PB))
            part = jnp.sum(jnp.where(hit, lut3, 0.0), axis=1, keepdims=True)
            acc = acc + jnp.sum(part, axis=0)
        out_ref[0] = acc
    return kern


def make_gather(S, K):
    NT = max(1, K // LANES)

    def kern(dlut_ref, codes_ref, out_ref):
        codes = codes_ref[0].astype(jnp.int32)
        for j in range(PB // LANES):
            cj = codes[:, j * LANES : (j + 1) * LANES]
            cm = jax.lax.bitwise_and(cj, LANES - 1)
            g = jnp.take_along_axis(dlut_ref[0, 0], cm, axis=1)
            for t in range(1, NT):
                gt = jnp.take_along_axis(dlut_ref[0, t], cm, axis=1)
                g = jnp.where(jax.lax.shift_right_logical(cj, 7) == t, gt, g)
            out_ref[0, 0, j * LANES : (j + 1) * LANES] = jnp.sum(g, axis=0)
    return kern


def run(name, kern, dlut_in, codes_all, S):
    f = pl.pallas_call(
        kern,
        grid=(ncells, NB),
        in_specs=[
            pl.BlockSpec(
                (1,) + dlut_in.shape[1:], lambda c, b: (c % Q,) + (0,) * (dlut_in.ndim - 1)
            ),
            pl.BlockSpec((1, S, PB), lambda c, b: (c % P, 0, b)),
        ],
        out_specs=pl.BlockSpec((1, 1, PB), lambda c, b: (c, 0, b)),
        out_shape=jax.ShapeDtypeStruct((ncells, 1, PMAX), jnp.float32),
    )

    @jax.jit
    def timed(dlut_in, codes_all):
        def body(carry, _):
            out = f(dlut_in + carry, codes_all)
            # data dependence: next step's LUT depends on this output
            return carry + out[0, 0, 0] * 1e-30, None
        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return carry

    t0 = time.time()
    timed(dlut_in, codes_all).block_until_ready()
    print(f"{name}: compile+first {time.time()-t0:.2f}s", flush=True)
    t0 = time.time()
    timed(dlut_in, codes_all).block_until_ready()
    total = time.time() - t0
    dt = total / REPS
    print(f"{name}: {dt*1e3:.3f} ms/scan ({Q/dt:.0f} qps-equiv)", flush=True)
    return np.asarray(jax.jit(f)(dlut_in, codes_all))


rng = np.random.default_rng(0)
for bits, S, K in [(8, 16, 256), (4, 32, 16)]:
    print(f"--- {bits}-bit: S={S} K={K}", flush=True)
    dlut = rng.standard_normal((Q, S, K)).astype(np.float32)
    codes = rng.integers(0, K, (P, S, PMAX), dtype=np.uint8)
    NT = max(1, K // LANES)
    dl_pad = np.zeros((Q, NT, S, LANES), np.float32)
    for t in range(NT):
        w = min(LANES, K - t * LANES)
        if w > 0:
            dl_pad[:, t, :, :w] = dlut[:, :, t * LANES : t * LANES + w]
    a = run(f"select{bits}", make_select(S, K), jnp.asarray(dlut), jnp.asarray(codes), S)
    b = run(f"gather{bits}", make_gather(S, K), jnp.asarray(dl_pad), jnp.asarray(codes), S)
    c0 = 37
    want = dlut[c0 % Q][np.arange(S)[:, None], codes[c0 % P][:, :PB].astype(int)].sum(0)
    print("  select err:", np.abs(a[c0, 0, :PB] - want).max(),
          " gather err:", np.abs(b[c0, 0, :PB] - want).max(), flush=True)
