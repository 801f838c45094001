"""Pallas kernel correctness (interpret mode on CPU; the same program
compiles for TPU via Mosaic — validated separately on hardware)."""

import jax.numpy as jnp
import numpy as np

from lancedb_tpu.ops.pallas_adc import (
    build_dlut_padded,
    ivf_pq_adc_grouped_scan_pallas,
    ivf_pq_adc_scan_pallas,
    pad_codes_for_pallas,
)

RNG = np.random.default_rng(5)


def _run_case(P, PMAX, S, K, DSUB, Q, NP, kernel=ivf_pq_adc_scan_pallas):
    codebooks = RNG.standard_normal((S, K, DSUB)).astype(np.float32)
    codes = RNG.integers(0, K, (P, S, PMAX), dtype=np.uint8)  # (P, S, pmax)
    centroids = RNG.standard_normal((P, S * DSUB)).astype(np.float32)
    q = RNG.standard_normal((Q, S * DSUB)).astype(np.float32)
    probe_ids = np.stack([RNG.choice(P, NP, replace=False) for _ in range(Q)]).astype(
        np.int32
    )

    # reconstruction-based ground truth
    recon = np.zeros((P, PMAX, S * DSUB), dtype=np.float32)
    for p in range(P):
        for r in range(PMAX):
            for s in range(S):
                recon[p, r, s * DSUB : (s + 1) * DSUB] = codebooks[s, codes[p, s, r]]
    recon = recon + centroids[:, None, :]
    rnorms = np.sum(recon**2, axis=2).astype(np.float32)
    qc = np.stack([q[i] @ centroids[probe_ids[i]].T for i in range(Q)]).astype(np.float32)
    qn2 = np.sum(q**2, axis=1).astype(np.float32)

    padded = pad_codes_for_pallas(codes)
    dlut = build_dlut_padded(q, codebooks, padded.shape[1])
    out = np.asarray(
        kernel(
            jnp.asarray(probe_ids), jnp.asarray(dlut), jnp.asarray(padded),
            jnp.asarray(rnorms), jnp.asarray(qc), jnp.asarray(qn2),
            interpret=True,
        )
    )
    return out, q, recon, probe_ids


def test_adc_scan_matches_reference_8bit():
    out, q, recon, probe_ids = _run_case(P=6, PMAX=128, S=8, K=256, DSUB=4, Q=4, NP=3)
    for i in range(out.shape[0]):
        for j in range(out.shape[1]):
            pid = probe_ids[i, j]
            expected = ((q[i][None, :] - recon[pid]) ** 2).sum(1)
            np.testing.assert_allclose(out[i, j], expected, rtol=2e-2, atol=0.5)


def test_adc_scan_matches_reference_4bit():
    out, q, recon, probe_ids = _run_case(P=4, PMAX=128, S=16, K=16, DSUB=2, Q=3, NP=2)
    for i in range(out.shape[0]):
        for j in range(out.shape[1]):
            pid = probe_ids[i, j]
            expected = ((q[i][None, :] - recon[pid]) ** 2).sum(1)
            np.testing.assert_allclose(out[i, j], expected, rtol=2e-2, atol=0.5)


def test_adc_grouped_scan_matches_reference_4bit():
    """Grouped one-hot-matmul variant (shared per-partition decode)."""
    out, q, recon, probe_ids = _run_case(
        P=4, PMAX=128, S=16, K=16, DSUB=2, Q=3, NP=2,
        kernel=ivf_pq_adc_grouped_scan_pallas,
    )
    for i in range(out.shape[0]):
        for j in range(out.shape[1]):
            pid = probe_ids[i, j]
            expected = ((q[i][None, :] - recon[pid]) ** 2).sum(1)
            np.testing.assert_allclose(out[i, j], expected, rtol=2e-2, atol=0.5)


def test_adc_grouped_scan_matches_reference_8bit():
    """Grouped lane-gather variant (resident LUTs, K=256)."""
    out, q, recon, probe_ids = _run_case(
        P=6, PMAX=128, S=8, K=256, DSUB=4, Q=4, NP=3,
        kernel=ivf_pq_adc_grouped_scan_pallas,
    )
    for i in range(out.shape[0]):
        for j in range(out.shape[1]):
            pid = probe_ids[i, j]
            expected = ((q[i][None, :] - recon[pid]) ** 2).sum(1)
            np.testing.assert_allclose(out[i, j], expected, rtol=2e-2, atol=0.5)


def test_adc_grouped_shared_partitions():
    """Many queries probing the SAME partitions (the amortization case)
    still yield per-pair-exact distances after scatter-back."""
    out, q, recon, probe_ids = _run_case(
        P=3, PMAX=128, S=16, K=16, DSUB=2, Q=8, NP=3,
        kernel=ivf_pq_adc_grouped_scan_pallas,
    )
    for i in range(out.shape[0]):
        for j in range(out.shape[1]):
            pid = probe_ids[i, j]
            expected = ((q[i][None, :] - recon[pid]) ** 2).sum(1)
            np.testing.assert_allclose(out[i, j], expected, rtol=2e-2, atol=0.5)


def test_adc_scan_padding_slots():
    """+inf rnorm padding slots surface as huge distances."""
    P, PMAX, S, K, DSUB = 2, 128, 8, 16, 2
    codebooks = RNG.standard_normal((S, K, DSUB)).astype(np.float32)
    codes = RNG.integers(0, K, (P, S, PMAX), dtype=np.uint8)
    rnorms = np.ones((P, PMAX), np.float32)
    rnorms[:, 100:] = 3.0e38  # padding
    q = RNG.standard_normal((1, S * DSUB)).astype(np.float32)
    probe_ids = np.array([[0, 1]], dtype=np.int32)
    qc = np.zeros((1, 2), np.float32)
    qn2 = np.sum(q**2, axis=1).astype(np.float32)
    padded = pad_codes_for_pallas(codes)
    dlut = build_dlut_padded(q, codebooks, padded.shape[1])
    out = np.asarray(
        ivf_pq_adc_scan_pallas(
            jnp.asarray(probe_ids), jnp.asarray(dlut), jnp.asarray(padded),
            jnp.asarray(rnorms), jnp.asarray(qc), jnp.asarray(qn2), interpret=True,
        )
    )
    assert (out[:, :, 100:] > 1e30).all()
    assert (out[:, :, :100] < 1e6).all()


def test_subvector_padding_contributes_zero():
    """S not a multiple of 8 pads with code 0 + zero dlut rows."""
    P, PMAX, S, K, DSUB = 2, 128, 6, 16, 2
    codebooks = RNG.standard_normal((S, K, DSUB)).astype(np.float32)
    codes = RNG.integers(0, K, (P, S, PMAX), dtype=np.uint8)
    padded = pad_codes_for_pallas(codes)
    assert padded.shape == (P, 8, PMAX)
    q = RNG.standard_normal((2, S * DSUB)).astype(np.float32)
    dlut = build_dlut_padded(q, codebooks, 8)
    assert dlut.shape == (2, 8, K)
    assert (dlut[:, S:] == 0).all()


# ---------------------------------------------------------------------------
# fused IVF_FLAT probe-scan kernels (ops/pallas_scan.py + pallas_group_scan.py)
# ---------------------------------------------------------------------------

from lancedb_tpu.ops.pallas_group_scan import ivf_flat_grouped_scan_pallas
from lancedb_tpu.ops.pallas_scan import ivf_flat_scan_pallas


def _flat_case(P=5, PMAX=16, D=128, Q=4, NP=3, metric="l2", dup_probes=False, seed=11):
    rng = np.random.default_rng(seed)
    vectors = rng.standard_normal((P, PMAX, D)).astype(np.float32)
    q = rng.standard_normal((Q, D)).astype(np.float32)
    if dup_probes:  # every query probes the same partitions (grouping path)
        probe_ids = np.tile(rng.choice(P, NP, replace=False), (Q, 1)).astype(np.int32)
    else:
        probe_ids = np.stack(
            [rng.choice(P, NP, replace=False) for _ in range(Q)]
        ).astype(np.int32)
    if metric == "l2":
        alpha = np.full(Q, -2.0, np.float32)
        gamma = (q**2).sum(1).astype(np.float32)
        norms = (vectors**2).sum(2).astype(np.float32)
        expected = np.stack([
            ((q[i][None, None, :] - vectors[probe_ids[i]]) ** 2).sum(-1)
            for i in range(Q)
        ])
    elif metric == "dot":
        alpha = np.full(Q, -1.0, np.float32)
        gamma = np.zeros(Q, np.float32)
        norms = np.zeros((P, PMAX), np.float32)
        expected = np.stack([
            -(vectors[probe_ids[i]] @ q[i]) for i in range(Q)
        ])
    else:
        raise ValueError(metric)
    return vectors, q, probe_ids, alpha, gamma, norms, expected


class TestFlatScanKernel:
    def test_l2_matches_numpy(self):
        vectors, q, pids, a, g, n, expected = _flat_case()
        out = np.asarray(ivf_flat_scan_pallas(
            jnp.asarray(pids), jnp.asarray(q), jnp.asarray(vectors),
            jnp.asarray(n), jnp.asarray(a), jnp.asarray(g), interpret=True,
        ))
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-3)

    def test_dot_matches_numpy(self):
        vectors, q, pids, a, g, n, expected = _flat_case(metric="dot")
        out = np.asarray(ivf_flat_scan_pallas(
            jnp.asarray(pids), jnp.asarray(q), jnp.asarray(vectors),
            jnp.asarray(n), jnp.asarray(a), jnp.asarray(g), interpret=True,
        ))
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-3)

    def test_bfloat16_storage(self):
        vectors, q, pids, a, g, n, expected = _flat_case()
        out = np.asarray(ivf_flat_scan_pallas(
            jnp.asarray(pids), jnp.asarray(q),
            jnp.asarray(vectors).astype(jnp.bfloat16),
            jnp.asarray(n), jnp.asarray(a), jnp.asarray(g), interpret=True,
        ))
        # bf16 storage: ~1% relative tolerance
        np.testing.assert_allclose(out, expected, rtol=3e-2, atol=0.5)

    def test_wide_dim_multiple_of_128(self):
        vectors, q, pids, a, g, n, expected = _flat_case(D=256, PMAX=8)
        out = np.asarray(ivf_flat_scan_pallas(
            jnp.asarray(pids), jnp.asarray(q), jnp.asarray(vectors),
            jnp.asarray(n), jnp.asarray(a), jnp.asarray(g), interpret=True,
        ))
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-3)

    def test_rejects_unaligned_dim(self):
        import pytest

        vectors, q, pids, a, g, n, _ = _flat_case(D=128)
        with pytest.raises(ValueError, match="multiple of 128"):
            ivf_flat_scan_pallas(
                jnp.asarray(pids), jnp.asarray(q[:, :100]),
                jnp.asarray(vectors[:, :, :100]),
                jnp.asarray(n), jnp.asarray(a), jnp.asarray(g), interpret=True,
            )


class TestGroupedScanKernel:
    def test_matches_plain_scan(self):
        vectors, q, pids, a, g, n, expected = _flat_case(Q=6, NP=2)
        out = np.asarray(ivf_flat_grouped_scan_pallas(
            jnp.asarray(pids), jnp.asarray(q), jnp.asarray(vectors),
            jnp.asarray(n), jnp.asarray(a), jnp.asarray(g), interpret=True,
        ))
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-3)

    def test_duplicate_probes_grouped(self):
        """All queries probing the same partitions exercises the
        query-grouping layout (the win case: one DMA per partition)."""
        vectors, q, pids, a, g, n, expected = _flat_case(Q=8, NP=2, dup_probes=True)
        out = np.asarray(ivf_flat_grouped_scan_pallas(
            jnp.asarray(pids), jnp.asarray(q), jnp.asarray(vectors),
            jnp.asarray(n), jnp.asarray(a), jnp.asarray(g), interpret=True,
        ))
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-3)

    def test_single_query_single_probe(self):
        vectors, q, pids, a, g, n, expected = _flat_case(Q=1, NP=1)
        out = np.asarray(ivf_flat_grouped_scan_pallas(
            jnp.asarray(pids), jnp.asarray(q), jnp.asarray(vectors),
            jnp.asarray(n), jnp.asarray(a), jnp.asarray(g), interpret=True,
        ))
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-3)

    def test_qpc_padding_does_not_leak(self):
        """Group padding slots (qpc not dividing the run length) must not
        corrupt real outputs."""
        vectors, q, pids, a, g, n, expected = _flat_case(Q=3, NP=3)
        out = np.asarray(ivf_flat_grouped_scan_pallas(
            jnp.asarray(pids), jnp.asarray(q), jnp.asarray(vectors),
            jnp.asarray(n), jnp.asarray(a), jnp.asarray(g), qpc=4, interpret=True,
        ))
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-3)


class TestAdcKernelVariants:
    def test_gather_and_select_agree(self):
        """The 8-bit lane-gather kernel and the 4-bit select sweep are
        the same math: force K=16 through both and compare."""
        import lancedb_tpu.ops.pallas_adc as adc

        P, PMAX, S, K, DSUB, Q, NP = 3, 128, 8, 16, 2, 2, 2
        codebooks = RNG.standard_normal((S, K, DSUB)).astype(np.float32)
        codes = RNG.integers(0, K, (P, S, PMAX), dtype=np.uint8)
        rnorms = RNG.standard_normal((P, PMAX)).astype(np.float32) ** 2
        q = RNG.standard_normal((Q, S * DSUB)).astype(np.float32)
        probe_ids = np.stack([RNG.choice(P, NP, replace=False) for _ in range(Q)]).astype(np.int32)
        qc = np.zeros((Q, NP), np.float32)
        qn2 = (q**2).sum(1).astype(np.float32)
        padded = pad_codes_for_pallas(codes)
        dlut = build_dlut_padded(q, codebooks, padded.shape[1])
        args = (jnp.asarray(probe_ids), jnp.asarray(dlut), jnp.asarray(padded),
                jnp.asarray(rnorms), jnp.asarray(qc), jnp.asarray(qn2))
        out_select = np.asarray(ivf_pq_adc_scan_pallas(*args, interpret=True))
        orig = adc.SELECT_MAX_K
        try:
            adc.SELECT_MAX_K = 0  # force the gather path for K=16
            out_gather = np.asarray(ivf_pq_adc_scan_pallas(*args, interpret=True))
        finally:
            adc.SELECT_MAX_K = orig
        np.testing.assert_allclose(out_select, out_gather, rtol=1e-5, atol=1e-4)

    def test_rejects_unaligned_pmax(self):
        import pytest

        with pytest.raises(ValueError, match="pmax"):
            ivf_pq_adc_scan_pallas(
                jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 8, 16)),
                jnp.zeros((1, 8, 100), jnp.uint8), jnp.zeros((1, 100)),
                jnp.zeros((1, 1)), jnp.zeros((1,)), interpret=True,
            )
