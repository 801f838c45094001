"""Device kernel tests (run on the CPU backend; same XLA programs
compile for TPU). Numerical ground truth via numpy."""

import jax.numpy as jnp
import numpy as np
import pytest

from lancedb_tpu.ops import (
    adc_lut,
    adc_scan_lut,
    blocked_topk_scan,
    default_num_sub_vectors,
    hamming_distance,
    kmeans_assign,
    kmeans_fit,
    mask_and_topk,
    merge_topk,
    pairwise_distance,
    pq_encode,
    pq_reconstruct,
    pq_train,
    refine_distances,
    topk_smallest,
)

RNG = np.random.default_rng(42)


def np_l2(q, x):
    return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)


class TestDistance:
    def test_l2(self):
        q = RNG.standard_normal((4, 32)).astype(np.float32)
        x = RNG.standard_normal((64, 32)).astype(np.float32)
        d = np.asarray(pairwise_distance(jnp.asarray(q), jnp.asarray(x), "l2"))
        np.testing.assert_allclose(d, np_l2(q, x), rtol=1e-4, atol=1e-3)

    def test_cosine(self):
        q = RNG.standard_normal((4, 32)).astype(np.float32)
        x = RNG.standard_normal((64, 32)).astype(np.float32)
        d = np.asarray(pairwise_distance(jnp.asarray(q), jnp.asarray(x), "cosine"))
        expected = 1 - (q @ x.T) / (
            np.linalg.norm(q, axis=1)[:, None] * np.linalg.norm(x, axis=1)[None, :]
        )
        np.testing.assert_allclose(d, expected, rtol=1e-4, atol=1e-4)

    def test_dot(self):
        q = RNG.standard_normal((4, 32)).astype(np.float32)
        x = RNG.standard_normal((64, 32)).astype(np.float32)
        d = np.asarray(pairwise_distance(jnp.asarray(q), jnp.asarray(x), "dot"))
        np.testing.assert_allclose(d, -(q @ x.T), rtol=1e-4, atol=1e-4)

    def test_metric_aliases(self):
        q = RNG.standard_normal((2, 8)).astype(np.float32)
        x = RNG.standard_normal((4, 8)).astype(np.float32)
        a = np.asarray(pairwise_distance(jnp.asarray(q), jnp.asarray(x), "euclidean"))
        b = np.asarray(pairwise_distance(jnp.asarray(q), jnp.asarray(x), "L2"))
        np.testing.assert_allclose(a, b)

    def test_hamming(self):
        q = RNG.integers(0, 256, (3, 16), dtype=np.uint8)
        x = RNG.integers(0, 256, (10, 16), dtype=np.uint8)
        d = np.asarray(hamming_distance(jnp.asarray(q), jnp.asarray(x)))
        expected = np.zeros((3, 10))
        for i in range(3):
            for j in range(10):
                expected[i, j] = bin(
                    int.from_bytes(q[i].tobytes(), "big") ^ int.from_bytes(x[j].tobytes(), "big")
                ).count("1")
        np.testing.assert_allclose(d, expected)

    def test_refine(self):
        q = RNG.standard_normal((3, 16)).astype(np.float32)
        c = RNG.standard_normal((3, 5, 16)).astype(np.float32)
        d = np.asarray(refine_distances(jnp.asarray(q), jnp.asarray(c), "l2"))
        expected = ((q[:, None, :] - c) ** 2).sum(-1)
        np.testing.assert_allclose(d, expected, rtol=1e-4, atol=1e-3)


class TestTopK:
    def test_exact(self):
        d = RNG.standard_normal((5, 200)).astype(np.float32)
        vals, idx = topk_smallest(jnp.asarray(d), 10)
        expected_idx = np.argsort(d, axis=1)[:, :10]
        np.testing.assert_allclose(np.sort(vals, axis=1), np.sort(np.take_along_axis(d, expected_idx, 1), axis=1), rtol=1e-6)

    def test_merge(self):
        va = jnp.asarray([[1.0, 3.0]]);  ia = jnp.asarray([[10, 30]])
        vb = jnp.asarray([[2.0, 0.5]]);  ib = jnp.asarray([[20, 5]])
        v, i = merge_topk(va, ia, vb, ib, 3)
        assert v.tolist() == [[0.5, 1.0, 2.0]]
        assert i.tolist() == [[5, 10, 20]]

    def test_mask(self):
        d = jnp.asarray([[1.0, 0.1, 0.2, 0.05]])
        valid = jnp.asarray([[True, False, True, False]])
        v, i = mask_and_topk(d, valid, 2)
        assert i.tolist() == [[2, 0]]

    def test_blocked_scan_matches_full(self):
        q = RNG.standard_normal((4, 16)).astype(np.float32)
        x = RNG.standard_normal((512, 16)).astype(np.float32)
        block = 128
        xj = jnp.asarray(x)
        qj = jnp.asarray(q)

        def score_block(i):
            blk = jax.lax.dynamic_slice_in_dim(xj, i * block, block, axis=0)
            d = pairwise_distance(qj, blk, "l2")
            ids = (i * block + jnp.arange(block)).astype(jnp.int64)
            return d, ids

        import jax

        vals, ids = blocked_topk_scan(score_block, 512 // block, 5, 4)
        full = np_l2(q, x)
        expected_ids = np.argsort(full, axis=1)[:, :5]
        np.testing.assert_array_equal(np.sort(np.asarray(ids), 1), np.sort(expected_ids, 1))


class TestKMeans:
    def test_recovers_clusters(self):
        # 4 well-separated blobs
        centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], dtype=np.float32)
        pts = np.concatenate(
            [c + 0.1 * RNG.standard_normal((200, 2)).astype(np.float32) for c in centers]
        )
        cents = kmeans_fit(pts, 4, max_iters=20, seed=1)
        # every learned centroid lands near a true one
        d = np_l2(cents, centers)
        assert (d.min(axis=1) < 0.5).all()
        assign = kmeans_assign(pts, cents)
        assert len(np.unique(assign)) == 4
        # all points of one blob share a partition
        for b in range(4):
            blob = assign[b * 200 : (b + 1) * 200]
            assert len(np.unique(blob)) == 1

    def test_cosine_spherical(self):
        pts = RNG.standard_normal((500, 8)).astype(np.float32)
        cents = kmeans_fit(pts, 8, metric="cosine", max_iters=10)
        norms = np.linalg.norm(cents, axis=1)
        np.testing.assert_allclose(norms, 1.0, rtol=1e-3)

    def test_sampling(self):
        pts = RNG.standard_normal((10_000, 4)).astype(np.float32)
        cents = kmeans_fit(pts, 4, sample_rate=16)  # only 64 rows sampled
        assert cents.shape == (4, 4)
        assert np.isfinite(cents).all()


class TestPQ:
    def test_default_subvectors(self):
        assert default_num_sub_vectors(128) == 8
        assert default_num_sub_vectors(960) == 60
        assert default_num_sub_vectors(24) == 3
        assert default_num_sub_vectors(7) == 1

    def test_roundtrip_accuracy(self):
        x = RNG.standard_normal((2000, 32)).astype(np.float32)
        cb = pq_train(x, num_sub_vectors=8, max_iters=25, seed=0)
        assert cb.shape == (8, 256, 4)
        codes = pq_encode(x, cb)
        assert codes.shape == (2000, 8) and codes.dtype == np.uint8
        recon = pq_reconstruct(codes, cb)
        rel_err = np.linalg.norm(recon - x) / np.linalg.norm(x)
        assert rel_err < 0.35  # 8 bytes for 128 bytes of data

    def test_adc_matches_reconstruction_distance(self):
        x = RNG.standard_normal((500, 16)).astype(np.float32)
        q = RNG.standard_normal((3, 16)).astype(np.float32)
        cb = pq_train(x, num_sub_vectors=4, max_iters=15)
        codes = pq_encode(x, cb)
        luts = adc_lut(jnp.asarray(q), jnp.asarray(cb))
        d_lut = np.asarray(adc_scan_lut(luts, jnp.asarray(codes)))
        recon = pq_reconstruct(codes, cb)
        d_exact = np_l2(q, recon)
        np.testing.assert_allclose(d_lut, d_exact, rtol=2e-2, atol=2e-1)

    def test_adc_ranking_recall(self):
        """PQ ADC top-10 should overlap well with exact top-10."""
        x = RNG.standard_normal((3000, 64)).astype(np.float32)
        q = RNG.standard_normal((8, 64)).astype(np.float32)
        cb = pq_train(x, num_sub_vectors=16, max_iters=25)
        codes = pq_encode(x, cb)
        luts = adc_lut(jnp.asarray(q), jnp.asarray(cb))
        d_adc = np.asarray(adc_scan_lut(luts, jnp.asarray(codes)))
        exact = np_l2(q, x)
        recall = 0
        for i in range(8):
            approx_top = set(np.argsort(d_adc[i])[:10].tolist())
            exact_top = set(np.argsort(exact[i])[:10].tolist())
            recall += len(approx_top & exact_top) / 10
        assert recall / 8 > 0.5  # unrefined ADC on random data


import jax  # noqa: E402  (used inside TestTopK)
