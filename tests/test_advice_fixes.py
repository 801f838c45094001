"""Regression tests for the round-1 advisor findings (ADVICE.md).

1. scalar-index artifacts never use pickle (Arrow IPC for object keys)
2. QueryServer rejects requests with a bad/missing x-api-key
3. FTS AND with an unindexed required term matches nothing
4. SQL % is truncated remainder (sign of the dividend)
5. dataset open uses the branch-head cache (O(1) manifest reads)
"""

import json

import numpy as np
import pyarrow as pa
import pytest

import lancedb_tpu


# ---------------------------------------------------------------- 1. pickle
def test_scalar_index_artifacts_contain_no_pickle(tmp_db):
    tbl = tmp_db.create_table(
        "t",
        pa.table(
            {
                "id": pa.array(np.arange(64, dtype=np.int64)),
                "name": pa.array([f"name-{i % 9}" for i in range(64)]),
                "tags": pa.array([[f"tag{i % 3}", f"tag{i % 5}"] for i in range(64)]),
            }
        ),
    )
    tbl.create_scalar_index("name", index_type="BITMAP")
    tbl.create_scalar_index("tags", index_type="LABEL_LIST")

    # every persisted .npy must load with allow_pickle=False or be Arrow IPC
    import io
    import pathlib

    root = pathlib.Path(tmp_db.uri)
    npys = list(root.rglob("*.npy"))
    assert npys, "expected index artifacts on disk"
    for p in npys:
        data = p.read_bytes()
        if data[:6] == b"\x93NUMPY":
            np.load(io.BytesIO(data), allow_pickle=False)  # raises if pickled
        else:
            pa.ipc.open_file(pa.BufferReader(data)).read_all()

    # and lookups still work through the loaded index
    assert tbl.search(None).where("name = 'name-3'").to_arrow().num_rows == 7
    assert (
        tbl.search(None).where("name >= 'name-7'").to_arrow().num_rows
        == 14  # name-7 (7) + name-8 (7)
    )


def test_btree_string_index_roundtrip(tmp_db):
    tbl = tmp_db.create_table(
        "t",
        pa.table({"s": pa.array(["b", "a", "c", None, "a"]), "i": pa.array(range(5))}),
    )
    tbl.create_scalar_index("s", index_type="BTREE")
    out = tbl.search(None).where("s = 'a'").to_arrow()
    assert sorted(out.column("i").to_pylist()) == [1, 4]


# ---------------------------------------------------------------- 2. auth
def test_query_server_requires_api_key(tmp_path):
    import urllib.error
    import urllib.request

    from lancedb_tpu.remote.server import QueryServer

    db = lancedb_tpu.connect(str(tmp_path / "db"))
    db.create_table("t", pa.table({"x": pa.array([1, 2, 3])}))

    with QueryServer(str(tmp_path / "db"), api_key="sekrit") as srv:
        # no key → 401
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{srv.url}/v1/table", timeout=5)
        assert ei.value.code == 401
        # wrong key → 401
        req = urllib.request.Request(
            f"{srv.url}/v1/table", headers={"x-api-key": "wrong"}
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=5)
        assert ei.value.code == 401
        # right key → 200
        req = urllib.request.Request(
            f"{srv.url}/v1/table", headers={"x-api-key": "sekrit"}
        )
        with urllib.request.urlopen(req, timeout=5) as resp:
            assert json.loads(resp.read())["tables"] == ["t"]


def test_query_server_nonloopback_requires_key(tmp_path):
    from lancedb_tpu.remote.server import QueryServer

    with pytest.raises(ValueError, match="api_key"):
        QueryServer(str(tmp_path / "db"), host="0.0.0.0")


def test_remote_client_sends_api_key(tmp_path):
    from lancedb_tpu.remote.server import QueryServer

    db = lancedb_tpu.connect(str(tmp_path / "db"))
    db.create_table("t", pa.table({"x": pa.array([1, 2, 3])}))
    with QueryServer(str(tmp_path / "db"), api_key="sekrit") as srv:
        rdb = lancedb_tpu.connect(
            "db://test", host_override=srv.url, api_key="sekrit"
        )
        assert rdb.table_names() == ["t"]


# ---------------------------------------------------------------- 3. FTS AND
def test_fts_and_with_unknown_term_matches_nothing(tmp_db):
    tbl = tmp_db.create_table(
        "t",
        pa.table(
            {
                "text": pa.array(
                    ["the quick brown fox", "quick silver", "slow brown turtle"]
                ),
                "i": pa.array(range(3)),
            }
        ),
    )
    tbl.create_fts_index("text")
    from lancedb_tpu.query_fts import MatchQuery

    hits = tbl.search(MatchQuery("quick zzzz", "text", operator="AND")).to_arrow()
    assert hits.num_rows == 0
    # sanity: both-present AND still matches
    hits = tbl.search(MatchQuery("quick brown", "text", operator="AND")).to_arrow()
    assert hits.column("i").to_pylist() == [0]


# ---------------------------------------------------------------- 4. modulo
def test_sql_modulo_truncated_remainder():
    from lancedb_tpu.filters.eval import evaluate_expression

    data = pa.table({"a": pa.array([-7, 7, -7, 7]), "b": pa.array([3, 3, -3, -3])})
    out = evaluate_expression(data, "a % b")
    # truncated remainder: sign of the dividend (DataFusion/Postgres)
    assert out.to_pylist() == [-1, 1, -1, 1]
    fdata = pa.table({"a": pa.array([-7.5]), "b": pa.array([3.0])})
    out = evaluate_expression(fdata, "a % b")
    assert out.to_pylist() == [pytest.approx(-1.5)]


# ------------------------------------------------------- 5. head-cache open
def test_open_uses_branch_head_cache(tmp_db):
    tbl = tmp_db.create_table("t", pa.table({"x": pa.array([1])}))
    for i in range(5):
        tbl.add(pa.table({"x": pa.array([i])}))

    from lancedb_tpu.storage.dataset import Dataset

    ds = tbl._dataset
    reads = []
    orig = Dataset._read_manifest

    def counting(store, root, version):
        reads.append(version)
        return orig(store, root, version)

    Dataset._read_manifest = staticmethod(counting)
    try:
        reopened = Dataset.open(ds.store, ds.root)
    finally:
        Dataset._read_manifest = staticmethod(orig)
    assert reopened.manifest.version == ds.manifest.version
    # head cache is current → exactly one validation read + one open read
    assert len(reads) <= 2, f"expected O(1) manifest reads, saw {reads}"


def test_open_with_stale_head_cache_finds_latest(tmp_db):
    tbl = tmp_db.create_table("t", pa.table({"x": pa.array([1])}))
    for i in range(3):
        tbl.add(pa.table({"x": pa.array([i])}))
    from lancedb_tpu.storage.dataset import Dataset, MAIN_BRANCH, REFS_DIR

    ds = tbl._dataset
    # simulate a committer that crashed before updating the head cache
    ds.store.write_bytes(
        f"{ds.root}/{REFS_DIR}/branches/{MAIN_BRANCH}.json",
        json.dumps({"version": 1}).encode(),
    )
    reopened = Dataset.open(ds.store, ds.root)
    assert reopened.manifest.version == ds.manifest.version
