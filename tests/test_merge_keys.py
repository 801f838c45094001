"""merge_insert join-key semantics: Arrow-native value equality
(reference MergeInsertBuilder, table/merge.rs:66-223)."""

import time

import numpy as np
import pyarrow as pa


def test_float_keys_exact(tmp_db):
    vals = np.array([0.1, 0.2, 0.30000000000000004, 1e-300, 3.5], dtype=np.float64)
    tbl = tmp_db.create_table(
        "t", pa.table({"k": pa.array(vals), "v": pa.array([0, 1, 2, 3, 4])})
    )
    src = pa.table({"k": pa.array(vals[[1, 3]]), "v": pa.array([10, 30])})
    stats = (
        tbl.merge_insert(["k"])
        .when_matched_update_all()
        .when_not_matched_insert_all()
        .execute(src)
    )
    assert stats["num_updated_rows"] == 2
    assert stats["num_inserted_rows"] == 0
    got = {r["k"]: r["v"] for r in tbl.search(None).to_list()}
    assert got[0.2] == 10 and got[1e-300] == 30 and got[3.5] == 4


def test_negative_zero_matches_zero(tmp_db):
    tbl = tmp_db.create_table(
        "t", pa.table({"k": pa.array([0.0, 1.0]), "v": pa.array([0, 1])})
    )
    src = pa.table({"k": pa.array([-0.0]), "v": pa.array([99])})
    stats = tbl.merge_insert(["k"]).when_matched_update_all().execute(src)
    # SQL equality: -0.0 = 0.0 (the old repr-string keys got this wrong)
    assert stats["num_updated_rows"] == 1
    got = {r["k"]: r["v"] for r in tbl.search(None).to_list()}
    assert got[0.0] == 99


def test_null_keys_never_match(tmp_db):
    tbl = tmp_db.create_table(
        "t", pa.table({"k": pa.array([None, "a"]), "v": pa.array([0, 1])})
    )
    src = pa.table({"k": pa.array([None, "a"]), "v": pa.array([50, 51])})
    stats = (
        tbl.merge_insert(["k"])
        .when_matched_update_all()
        .when_not_matched_insert_all()
        .execute(src)
    )
    assert stats["num_updated_rows"] == 1  # 'a' only
    assert stats["num_inserted_rows"] == 1  # the NULL source row inserts
    assert tbl.count_rows() == 3


def test_multi_column_keys(tmp_db):
    tbl = tmp_db.create_table(
        "t",
        pa.table(
            {
                "a": pa.array([1, 1, 2, 2]),
                "b": pa.array(["x", "y", "x", "y"]),
                "v": pa.array([0, 1, 2, 3]),
            }
        ),
    )
    src = pa.table(
        {"a": pa.array([1, 2, 3]), "b": pa.array(["y", "x", "z"]), "v": pa.array([10, 20, 30])}
    )
    stats = (
        tbl.merge_insert(["a", "b"])
        .when_matched_update_all()
        .when_not_matched_insert_all()
        .execute(src)
    )
    assert stats["num_updated_rows"] == 2
    assert stats["num_inserted_rows"] == 1
    got = {(r["a"], r["b"]): r["v"] for r in tbl.search(None).to_list()}
    assert got[(1, "y")] == 10 and got[(2, "x")] == 20 and got[(3, "z")] == 30
    assert got[(1, "x")] == 0 and got[(2, "y")] == 3


def test_merge_insert_scale(tmp_db):
    """500k-row upsert into a 500k-row table completes in seconds (the
    repr-string keys this replaced took minutes at 10M rows)."""
    n = 500_000
    tbl = tmp_db.create_table(
        "t",
        pa.table(
            {
                "id": pa.array(np.arange(n, dtype=np.int64)),
                "v": pa.array(np.zeros(n, dtype=np.int64)),
            }
        ),
    )
    src = pa.table(
        {
            "id": pa.array(np.arange(n // 2, n + n // 2, dtype=np.int64)),
            "v": pa.array(np.ones(n, dtype=np.int64)),
        }
    )
    t0 = time.time()
    stats = (
        tbl.merge_insert(["id"])
        .when_matched_update_all()
        .when_not_matched_insert_all()
        .execute(src)
    )
    dt = time.time() - t0
    assert stats["num_updated_rows"] == n // 2
    assert stats["num_inserted_rows"] == n // 2
    assert tbl.count_rows() == n + n // 2
    assert dt < 30, f"500k merge_insert took {dt:.1f}s"
