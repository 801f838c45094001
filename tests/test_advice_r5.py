"""Round-5 ADVICE fixes.

Covers:
  * HNSW on-disk graph format versioning (graph_format in meta.json,
    clear rebuild-required error for legacy CSR indexes).
  * HNSW host-walk seed fallback uses self.entry (no NameError).
  * HNSW ef > device bucket max routes to the host walk (recall honors
    the requested ef regardless of batch size).
  * Sticky warn-once device-beam failure fallback.
  * Dictionary CJK tokenizers record their EFFECTIVE scheme in the FTS
    index config and verify it at load time.
"""

import json

import numpy as np
import pyarrow as pa
import pytest

import lancedb_tpu
from lancedb_tpu.errors import InvalidInputError
from lancedb_tpu.index import HnswFlat
from lancedb_tpu.index.hnsw import GRAPH_FORMAT, HnswSearcher, build_hnsw_index
from lancedb_tpu.index.vector import SearchParams
from lancedb_tpu.io.object_store import MemoryStore
from lancedb_tpu.storage.dataset import Dataset

N, DIM = 500, 16
RNG = np.random.default_rng(5)
VECS = RNG.standard_normal((N, DIM)).astype(np.float32)


@pytest.fixture()
def dataset():
    store = MemoryStore()
    tbl = pa.table(
        {
            "id": pa.array(np.arange(N, dtype=np.int64)),
            "vector": pa.FixedSizeListArray.from_arrays(pa.array(VECS.ravel()), DIM),
        }
    )
    return Dataset.create(store, "t.lance", tbl.schema, tbl)


@pytest.fixture()
def built(dataset):
    meta = build_hnsw_index(dataset, "vector", HnswFlat(m=8, ef_construction=40))
    return dataset, dataset.index_dir(meta.uuid), meta


def test_graph_format_written_and_checked(built):
    ds, prefix, meta = built
    doc = json.loads(ds.store.read_bytes(f"{prefix}/meta.json"))
    assert doc["graph_format"] == GRAPH_FORMAT == "dense_v2"

    # simulate an index persisted by a different format revision
    doc["graph_format"] = "csr_v1"
    ds.store.write_bytes(f"{prefix}/meta.json", json.dumps(doc).encode())
    with pytest.raises(InvalidInputError, match="rebuild"):
        HnswSearcher(ds.store, prefix, meta)


def test_legacy_csr_files_raise_clear_error(built):
    ds, prefix, meta = built
    doc = json.loads(ds.store.read_bytes(f"{prefix}/meta.json"))
    # legacy index: no graph_format key, no dense adj files
    doc.pop("graph_format")
    ds.store.write_bytes(f"{prefix}/meta.json", json.dumps(doc).encode())
    for lv in range(doc["num_levels"]):
        try:
            ds.store.delete(f"{prefix}/level{lv}_adj.npy")
        except Exception:
            pass
    with pytest.raises(InvalidInputError, match="rebuild"):
        HnswSearcher(ds.store, prefix, meta)


def test_large_ef_routes_to_host_and_honors_recall(built):
    ds, prefix, meta = built
    s = HnswSearcher(ds.store, prefix, meta)
    q = VECS[:32]  # batch >= device min so the routing decision matters

    calls = {"batched": 0}
    orig = s.search_batched

    def spy(*a, **k):
        calls["batched"] += 1
        return orig(*a, **k)

    s.search_batched = spy
    d, r = s.search(q, SearchParams(k=5, ef=4096))
    assert calls["batched"] == 0  # ef beyond device bucket max → host walk
    # host walk with huge ef is near-exact: top-1 must be the query itself
    assert (r[:, 0] == np.arange(32).astype(np.uint64)).all()

    s2 = HnswSearcher(ds.store, prefix, meta)
    d2, r2 = s2.search(q, SearchParams(k=5, ef=64))
    assert (r2[:, 0] == np.arange(32).astype(np.uint64)).all()


def test_device_beam_failure_falls_back_once_with_warning(built, caplog):
    ds, prefix, meta = built
    s = HnswSearcher(ds.store, prefix, meta)

    def boom(*a, **k):
        raise RuntimeError("synthetic device failure")

    s.search_batched = boom
    with caplog.at_level("WARNING", logger="lancedb_tpu.index.hnsw"):
        d, r = s.search(VECS[:32], SearchParams(k=3))
    assert s._device_failed
    assert any("falling back" in rec.message for rec in caplog.records)
    assert (r[:, 0] == np.arange(32).astype(np.uint64)).all()
    # second call routes straight to host without re-raising
    d2, r2 = s.search(VECS[:32], SearchParams(k=3))
    assert (r2[:, 0] == np.arange(32).astype(np.uint64)).all()


def test_host_seed_fallback_uses_entry(built):
    ds, prefix, meta = built
    s = HnswSearcher(ds.store, prefix, meta)
    s._seed_layer0 = lambda dist_fn: []  # force the `seeds or [...]` branch
    d, r = s._search_host(VECS[:2], SearchParams(k=3))
    assert np.isfinite(d[:, 0]).all()  # no NameError, real results


# ---- tokenizer effective-scheme recording -----------------------------


def test_lindera_without_dict_uses_bundled_ja_seed_lexicon():
    """Out-of-the-box Japanese (VERDICT r4 missing #2): no dict_path
    resolves to the bundled seed lexicon, not the bigram fallback."""
    from lancedb_tpu.index.tokenizer import Tokenizer

    tok = Tokenizer(base="lindera", stem=False)
    assert tok.effective_scheme() == "mm-dict:builtin-ja-seed"
    toks = tok.tokenize("東京都に住む")
    assert "東京都" in toks and "住む" in toks


def test_lindera_unreadable_dict_records_bigram_scheme_and_warns(caplog):
    from lancedb_tpu.index.tokenizer import Tokenizer, _FALLBACK_WARNED

    _FALLBACK_WARNED.clear()
    tok = Tokenizer(base="lindera", dict_path="/nonexistent/user.dict")
    with caplog.at_level("WARNING", logger="lancedb_tpu.index.tokenizer"):
        scheme = tok.effective_scheme()
        tok.tokenize("東京都に住む")
    assert scheme == "cjk-bigram"
    warnings = [r for r in caplog.records if "bigram" in r.message]
    assert warnings, "fallback must warn"
    # warn-once: another call adds no new record
    n = len(caplog.records)
    with caplog.at_level("WARNING", logger="lancedb_tpu.index.tokenizer"):
        tok.tokenize("東京都に住む")
    assert len(caplog.records) == n


def test_legacy_bigram_lindera_index_pins_to_bigrams(tmp_path, monkeypatch):
    """A lindera index persisted before the bundled seed lexicon holds
    bigram postings under scheme "cjk-bigram"; loading it must pin
    querying to bigrams (mirroring the legacy_unicode pin) instead of
    raising or silently mis-matching with lexicon segmentation."""
    import lancedb_tpu
    from lancedb_tpu.index import tokenizer as tokmod

    tokmod._FALLBACK_WARNED.clear()

    def no_lexicon(path):  # simulates the pre-seed-lexicon build code
        raise OSError("no bundled lexicon in the old revision")

    monkeypatch.setattr(tokmod, "_load_mm_dict", no_lexicon)
    db = lancedb_tpu.connect(str(tmp_path / "db"))
    tbl = db.create_table(
        "t", pa.table({"text": pa.array(["東京都に住む", "hello world"])})
    )
    tbl.create_fts_index("text", base_tokenizer="lindera", stem=False)
    monkeypatch.undo()  # current revision again: lexicon available

    db2 = lancedb_tpu.connect(str(tmp_path / "db"))
    tbl2 = db2.open_table("t")
    # loads without raising, and the bigram pin matches the persisted
    # bigram postings (東京都 → 東京/京都)
    res = tbl2.search("東京都", query_type="fts").limit(10).to_arrow()
    assert res.num_rows == 1


def test_lindera_with_dict_records_mm_scheme(tmp_path):
    from lancedb_tpu.index.tokenizer import Tokenizer

    dict_path = tmp_path / "user.dict"
    dict_path.write_text("東京都 10\n住む 5\n", encoding="utf-8")
    tok = Tokenizer(base="lindera", dict_path=str(dict_path))
    assert tok.effective_scheme() == f"mm-dict:{dict_path}"
    toks = tok.tokenize("東京都に住む")
    assert "東京都" in toks


def test_fts_index_load_rejects_scheme_mismatch(tmp_path):
    """Index built with a dictionary engine must refuse to serve through
    the bigram fallback (silent near-zero recall otherwise)."""
    dict_path = tmp_path / "user.dict"
    dict_path.write_text("東京都 10\n住む 5\n", encoding="utf-8")
    db = lancedb_tpu.connect(str(tmp_path / "db"))
    tbl = db.create_table(
        "t", pa.table({"text": pa.array(["東京都に住む", "hello world"])})
    )
    tbl.create_fts_index(
        "text", base_tokenizer="lindera", dict_path=str(dict_path), stem=False
    )
    assert tbl.search("東京都", query_type="fts").limit(1).to_arrow().num_rows == 1

    # delete the dictionary: the same config now resolves to bigrams
    dict_path.unlink()
    from lancedb_tpu.index import tokenizer as tokmod

    tokmod._MM_DICT_CACHE.clear()
    tokmod._FALLBACK_WARNED.clear()
    db2 = lancedb_tpu.connect(str(tmp_path / "db"))
    tbl2 = db2.open_table("t")
    with pytest.raises(InvalidInputError, match="tokenization scheme"):
        tbl2.search("東京都", query_type="fts").limit(1).to_arrow()
