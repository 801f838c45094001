"""Pallas kernel correctness (interpret mode on CPU; the same program
compiles for TPU via Mosaic)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lancedb_tpu.ops.pallas_adc import (
    build_dlut_padded,
    ivf_pq_adc_scan_pallas,
    pad_codes_for_pallas,
)

RNG = np.random.default_rng(5)


def test_adc_scan_matches_reference():
    P, PMAX, S, K, DSUB = 6, 16, 8, 256, 4
    Q, NP = 4, 3
    codebooks = RNG.standard_normal((S, K, DSUB)).astype(np.float32)
    codes = RNG.integers(0, K, (P, PMAX, S), dtype=np.uint8)
    centroids = RNG.standard_normal((P, S * DSUB)).astype(np.float32)
    q = RNG.standard_normal((Q, S * DSUB)).astype(np.float32)
    probe_ids = np.stack([RNG.choice(P, NP, replace=False) for _ in range(Q)]).astype(np.int32)

    # reconstruction-based ground truth
    recon_res = np.zeros((P, PMAX, S * DSUB), dtype=np.float32)
    for p in range(P):
        for r in range(PMAX):
            for s in range(S):
                recon_res[p, r, s * DSUB : (s + 1) * DSUB] = codebooks[s, codes[p, r, s]]
    recon = recon_res + centroids[:, None, :]
    rnorms = np.sum(recon**2, axis=2).astype(np.float32)
    qc = np.stack([q[i] @ centroids[probe_ids[i]].T for i in range(Q)]).astype(np.float32)
    qn2 = np.sum(q**2, axis=1).astype(np.float32)

    padded_codes, s_pad = pad_codes_for_pallas(codes, codebooks)
    dlut = build_dlut_padded(q, codebooks, s_pad)
    out = np.asarray(
        ivf_pq_adc_scan_pallas(
            jnp.asarray(probe_ids), jnp.asarray(dlut), jnp.asarray(padded_codes),
            jnp.asarray(rnorms), jnp.asarray(qc), jnp.asarray(qn2),
            interpret=True,
        )
    )
    # expected: ||q - recon||² per (query, probe, slot)
    for i in range(Q):
        for j in range(NP):
            pid = probe_ids[i, j]
            expected = ((q[i][None, :] - recon[pid]) ** 2).sum(1)
            np.testing.assert_allclose(out[i, j], expected, rtol=2e-2, atol=0.5)


def test_adc_scan_padding_slots():
    """+inf rnorm padding slots surface as huge distances."""
    P, PMAX, S, K, DSUB = 2, 8, 8, 16, 2
    codebooks = RNG.standard_normal((S, K, DSUB)).astype(np.float32)
    codes = RNG.integers(0, K, (P, PMAX, S), dtype=np.uint8)
    rnorms = np.ones((P, PMAX), np.float32)
    rnorms[:, 6:] = 3.0e38  # padding
    q = RNG.standard_normal((1, S * DSUB)).astype(np.float32)
    probe_ids = np.array([[0, 1]], dtype=np.int32)
    qc = np.zeros((1, 2), np.float32)
    qn2 = np.sum(q**2, axis=1).astype(np.float32)
    padded_codes, s_pad = pad_codes_for_pallas(codes, codebooks)
    dlut = build_dlut_padded(q, codebooks, s_pad)
    out = np.asarray(
        ivf_pq_adc_scan_pallas(
            jnp.asarray(probe_ids), jnp.asarray(dlut), jnp.asarray(padded_codes),
            jnp.asarray(rnorms), jnp.asarray(qc), jnp.asarray(qn2), interpret=True,
        )
    )
    assert (out[:, :, 6:] > 1e30).all()
    assert (out[:, :, :6] < 1e6).all()
