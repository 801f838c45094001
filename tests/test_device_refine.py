"""Fused on-device refine (VectorSearcher.prepare_device_refine +
_device_refine_step): parity with the host refine path, metric math,
deletion masking, env kill-switch, and the public-API wiring.

Reference parity: refine_factor rerank (reference query.rs:1329) —
re-designed as a device-resident gather + MXU rerank chained on the
probed scan instead of the reference's late-materialization read."""

import os

import numpy as np
import pyarrow as pa
import pytest

import lancedb_tpu
from lancedb_tpu.index import IvfPq
from lancedb_tpu.index.vector import (
    SearchParams,
    build_vector_index,
    load_searcher,
)
from lancedb_tpu.io.object_store import MemoryStore
from lancedb_tpu.storage.dataset import Dataset

N, DIM = 2000, 32
RNG = np.random.default_rng(11)
VECS = RNG.standard_normal((N, DIM)).astype(np.float32)
QUERIES = RNG.standard_normal((8, DIM)).astype(np.float32)


def _dataset(metric_rows=VECS):
    tbl = pa.table({
        "id": pa.array(np.arange(len(metric_rows), dtype=np.int64)),
        "vector": pa.FixedSizeListArray.from_arrays(
            pa.array(metric_rows.ravel()), DIM
        ),
    })
    return Dataset.create(MemoryStore(), "t.lance", tbl.schema, tbl)


def _searcher(ds, metric="l2"):
    meta = build_vector_index(
        ds, "vector",
        IvfPq(num_partitions=8, num_sub_vectors=8, num_bits=4,
              distance_type=metric),
    )
    return load_searcher(ds, meta)


class TestDeviceRefine:
    def test_f32_matches_host_refine(self):
        ds = _dataset()
        s = _searcher(ds)
        params = SearchParams(k=10, nprobes=8, refine_factor=10)
        d_scan, r_scan = s.search(QUERIES, params)
        d_host, r_host = s.refine(ds, "vector", QUERIES, d_scan, r_scan, 10)
        assert s.prepare_device_refine(ds, "vector", precision="float32")
        assert s.device_refine_active
        d_dev, r_dev = s.search(QUERIES, params)
        assert d_dev.shape == (len(QUERIES), 10)
        # identical candidate set reranked with exact f32 math on both
        # paths → identical ids and distances (ties aside)
        np.testing.assert_allclose(np.sort(d_dev), np.sort(d_host), rtol=1e-4, atol=1e-4)
        agree = np.mean([
            len(set(r_dev[i].tolist()) & set(r_host[i].tolist())) / 10
            for i in range(len(QUERIES))
        ])
        assert agree >= 0.95, agree

    def test_bf16_close_to_host(self):
        ds = _dataset()
        s = _searcher(ds)
        params = SearchParams(k=10, nprobes=8, refine_factor=10)
        d_scan, r_scan = s.search(QUERIES, params)
        _, r_host = s.refine(ds, "vector", QUERIES, d_scan, r_scan, 10)
        assert s.prepare_device_refine(ds, "vector")  # default bf16
        _, r_dev = s.search(QUERIES, params)
        agree = np.mean([
            len(set(r_dev[i].tolist()) & set(r_host[i].tolist())) / 10
            for i in range(len(QUERIES))
        ])
        assert agree >= 0.85, agree  # bf16 misranks only near-ties

    def test_f16_residual_storage_matches_host(self):
        # sub-f32 tables store residuals vs the slot's IVF centroid and
        # reconstruct in-jit (x̂ = c + r): rounding applies only to the
        # small residual, so f16 tracks the exact host refine closely
        ds = _dataset()
        s = _searcher(ds)
        params = SearchParams(k=10, nprobes=8, refine_factor=10)
        d_scan, r_scan = s.search(QUERIES, params)
        d_host, r_host = s.refine(ds, "vector", QUERIES, d_scan, r_scan, 10)
        assert s.prepare_device_refine(ds, "vector", precision="float16")
        assert s._refine_residual
        d_dev, r_dev = s.search(QUERIES, params)
        agree = np.mean([
            len(set(r_dev[i].tolist()) & set(r_host[i].tolist())) / 10
            for i in range(len(QUERIES))
        ])
        assert agree >= 0.95, agree
        np.testing.assert_allclose(
            np.sort(d_dev), np.sort(d_host), rtol=5e-3, atol=5e-3
        )

    def test_f16_residual_cosine(self):
        ds = _dataset()
        s = _searcher(ds, metric="cosine")
        assert s.prepare_device_refine(ds, "vector", precision="float16")
        assert s._refine_residual
        d_dev, r_dev = s.search(
            QUERIES, SearchParams(k=5, nprobes=8, refine_factor=10)
        )
        qn = QUERIES / np.linalg.norm(QUERIES, axis=1, keepdims=True)
        xn = VECS / np.linalg.norm(VECS, axis=1, keepdims=True)
        for i in range(len(QUERIES)):
            ids = (r_dev[i] & np.uint64(0xFFFFFFFF)).astype(np.int64)
            expect = 1.0 - xn[ids] @ qn[i]
            np.testing.assert_allclose(d_dev[i], expect, rtol=5e-3, atol=5e-3)

    def test_cosine_distances_are_true_cosine(self):
        ds = _dataset()
        s = _searcher(ds, metric="cosine")
        assert s.prepare_device_refine(ds, "vector", precision="float32")
        d_dev, r_dev = s.search(
            QUERIES, SearchParams(k=5, nprobes=8, refine_factor=10)
        )
        qn = QUERIES / np.linalg.norm(QUERIES, axis=1, keepdims=True)
        xn = VECS / np.linalg.norm(VECS, axis=1, keepdims=True)
        for i in range(len(QUERIES)):
            ids = (r_dev[i] & np.uint64(0xFFFFFFFF)).astype(np.int64)
            expect = 1.0 - xn[ids] @ qn[i]
            np.testing.assert_allclose(d_dev[i], expect, rtol=1e-3, atol=1e-3)

    def test_deleted_rows_never_surface(self):
        ds = _dataset()
        s = _searcher(ds)
        assert s.prepare_device_refine(ds, "vector", precision="float32")
        # exact match query for row 3, then penalize row 3 out the way
        # the query layer does for deletes
        q = VECS[3:4]
        pen = s.slot_penalty(None, np.array([3], dtype=np.uint64))
        d, r = s.search(q, SearchParams(k=5, nprobes=8, refine_factor=10),
                        slot_penalty=pen)
        ids = (r[0] & np.uint64(0xFFFFFFFF)).astype(np.int64)
        assert 3 not in ids.tolist()
        assert np.all(np.isfinite(d[0]))

    def test_kill_switch_and_ineligible_types(self, monkeypatch):
        ds = _dataset()
        s = _searcher(ds)
        monkeypatch.setenv("LANCEDB_TPU_DEVICE_REFINE", "0")
        assert not s.prepare_device_refine(ds, "vector")
        monkeypatch.delenv("LANCEDB_TPU_DEVICE_REFINE")
        monkeypatch.setenv("LANCEDB_TPU_DEVICE_REFINE_BUDGET", "1024")
        assert not s.prepare_device_refine(ds, "vector")  # over budget
        assert not s.device_refine_active

    def test_public_api_uses_fused_path(self, tmp_path):
        db = lancedb_tpu.connect(str(tmp_path))
        rows = [
            {"id": int(i), "vector": VECS[i].tolist()} for i in range(N)
        ]
        tbl = db.create_table("t", rows)
        tbl.create_index(
            config=IvfPq(num_partitions=8, num_sub_vectors=8, num_bits=4),
            vector_column_name="vector",
        )
        got = (
            tbl.search(VECS[7].tolist())
            .nprobes(8)
            .refine_factor(10)
            .limit(5)
            .to_list()
        )
        assert got[0]["id"] == 7
        # env-disabled run (host refine) returns the same top hit
        os.environ["LANCEDB_TPU_DEVICE_REFINE"] = "0"
        try:
            db2 = lancedb_tpu.connect(str(tmp_path))
            tbl2 = db2.open_table("t")
            got2 = (
                tbl2.search(VECS[7].tolist())
                .nprobes(8)
                .refine_factor(10)
                .limit(5)
                .to_list()
            )
        finally:
            del os.environ["LANCEDB_TPU_DEVICE_REFINE"]
        assert got2[0]["id"] == 7
        assert [r["id"] for r in got][:3] == [r["id"] for r in got2][:3]
