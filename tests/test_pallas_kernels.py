"""Pallas kernel correctness (interpret mode on CPU; the same program
compiles for TPU via Mosaic — validated separately on hardware)."""

import jax.numpy as jnp
import numpy as np

from lancedb_tpu.ops.pallas_adc import (
    build_dlut_padded,
    ivf_pq_adc_scan_pallas,
    pad_codes_for_pallas,
)

RNG = np.random.default_rng(5)


def _run_case(P, PMAX, S, K, DSUB, Q, NP):
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
        ivf_pq_adc_scan_pallas(
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
