import time, numpy as np, jax, jax.numpy as jnp
import sys
sys.path.insert(0, '/root/repo')
print("backend:", jax.default_backend(), flush=True)
from lancedb_tpu.ops.pallas_adc import ivf_pq_adc_scan_pallas

def check(P, PMAX, S, K, Q, NP, label, perf_iters=0):
    rng = np.random.default_rng(0)
    probe = jnp.asarray(rng.integers(0, P, (Q, NP), dtype=np.int32))
    dlut = jnp.asarray(rng.standard_normal((Q, S, K)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, K, (P, S, PMAX), dtype=np.uint8))
    rnorms = jnp.asarray(rng.random((P, PMAX)).astype(np.float32))
    qc = jnp.asarray(rng.standard_normal((Q, NP)).astype(np.float32))
    qn2 = jnp.asarray(rng.random((Q,)).astype(np.float32))
    t0 = time.perf_counter()
    out = np.asarray(ivf_pq_adc_scan_pallas(probe, dlut, codes, rnorms, qc, qn2))
    print(f"{label}: compiled+ran in {time.perf_counter()-t0:.1f}s out={out.shape}", flush=True)
    pid = np.asarray(probe); dl = np.asarray(dlut); cd = np.asarray(codes)
    rn = np.asarray(rnorms); qcn = np.asarray(qc); qn = np.asarray(qn2)
    ref = np.zeros((Q, NP, PMAX), np.float32)
    for qi in range(Q):
        for j in range(NP):
            p = pid[qi, j]
            lutsum = dl[qi][np.arange(S)[:, None], cd[p]].sum(0)  # (PMAX,)
            ref[qi, j] = qn[qi] - 2.0 * (qcn[qi, j] + lutsum) + rn[p]
    err = np.max(np.abs(out - ref) / (np.abs(ref) + 1))
    print(f"{label}: max rel err vs numpy: {err:.2e}", flush=True)
    if perf_iters:
        # in-jit loop timing
        @jax.jit
        def run(dlut, codes, rnorms, qc, qn2, probe):
            def body(carry, i):
                d = dlut * (1 + carry * 1e-20)
                o = ivf_pq_adc_scan_pallas(probe, d, codes, rnorms, qc, qn2)
                return carry + jnp.sum(o[:, 0, 0]) * 1e-9, None
            return jax.lax.scan(body, jnp.float32(0), jnp.arange(perf_iters))[0]
        np.asarray(run(dlut, codes, rnorms, qc, qn2, probe))
        ts = []
        for r in range(3):
            f = dlut * (1 + 1e-6 * r)
            t0 = time.perf_counter(); np.asarray(run(f, codes, rnorms, qc, qn2, probe)); ts.append(time.perf_counter() - t0)
        per = float(np.median(ts)) / perf_iters
        print(f"{label}: {per*1e3:.2f} ms/batch  {Q/per:.0f} qps", flush=True)

check(64, 256, 16, 16, 8, 4, "small K=16")
check(64, 256, 16, 256, 8, 4, "small K=256")
check(1024, 1024, 32, 16, 128, 20, "sift1M-shape 4bit", perf_iters=8)
check(1024, 1024, 16, 256, 128, 20, "sift1M-shape 8bit", perf_iters=4)
