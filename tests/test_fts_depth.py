"""FTS depth: varint posting persistence, unicode/multilingual
tokenizers, MaxScore pruned top-k (VERDICT r1 item 10)."""

import numpy as np
import pyarrow as pa
import pytest

from lancedb_tpu.index import FTS
from lancedb_tpu.index.fts import build_fts_index, load_fts_index
from lancedb_tpu.index.tokenizer import Tokenizer
from lancedb_tpu.io.object_store import MemoryStore
from lancedb_tpu.storage.dataset import Dataset


# ------------------------------------------------------------- tokenizers
def test_unicode_tokenizer_cjk():
    t = Tokenizer(base="unicode", stem=False, remove_stop_words=False)
    toks = t.tokenize("日本語のtext processing")
    # CJK chars become unigrams; latin runs stay words
    assert "日" in toks and "本" in toks and "語" in toks
    assert "text" in toks and "processing" in toks


def test_unicode_tokenizer_keeps_accents_folded():
    t = Tokenizer(base="unicode", stem=False, remove_stop_words=False)
    assert t.tokenize("café résumé") == ["cafe", "resume"]


def test_simple_tokenizer_unchanged():
    t = Tokenizer(base="simple")
    assert t.tokenize("The quick brown foxes") == ["quick", "brown", "fox"]


def test_french_stemming_and_stopwords():
    t = Tokenizer(base="unicode", language="French")
    toks = t.tokenize("les nations et nationale")
    # stop words 'les'/'et' dropped; nations/nationale share a stem root
    assert "les" not in toks and "et" not in toks
    assert len(set(toks)) <= 2


def test_german_stemming():
    t = Tokenizer(base="unicode", language="German")
    a = t.tokenize("Zeitungen")
    b = t.tokenize("Zeitung")
    assert a == b


def test_unknown_language_no_stem():
    t = Tokenizer(language="Klingon")
    assert t.tokenize("running") == ["running"]


# ------------------------------------------------------- varint persistence
def test_vint_roundtrip_and_size(tmp_db):
    from lancedb_tpu.native import native_available

    n = 2000
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(words, 12)) for _ in range(n)]
    tbl = tmp_db.create_table(
        "t", pa.table({"text": pa.array(texts), "i": pa.array(range(n))})
    )
    tbl.create_fts_index("text", with_position=False)
    out = tbl.search("w1 w2").to_arrow()
    assert out.num_rows > 0

    import pathlib

    root = pathlib.Path(tmp_db.uri)
    if native_available():
        vints = list(root.rglob("postings_docs.npy.vint"))
        assert vints, "expected varint-coded postings on disk"
        raw_size = n * 12 * 8  # what int64 .npy postings would cost
        assert vints[0].stat().st_size < raw_size / 3
        assert not list(root.rglob("postings_docs.npy"))


def test_py_varint_decode_matches_native():
    from lancedb_tpu.index.fts import _py_varint_decode
    from lancedb_tpu.native import varint_encode_native

    vals = np.array([0, 1, 5, 5, 300, 2**40, 2**40 + 1, 7], dtype=np.int64)
    data = varint_encode_native(vals)
    if data is None:
        pytest.skip("native lib unavailable")
    out = _py_varint_decode(data, len(vals))
    assert np.array_equal(out, vals)


# ------------------------------------------------------------ MaxScore
def _zipf_corpus(n_docs=70_000, seed=0):
    rng = np.random.default_rng(seed)
    vocab = [f"term{i}" for i in range(2000)]
    # zipf-ish: low ids common, high ids rare
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    probs /= probs.sum()
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 15), p=probs))
        for _ in range(n_docs)
    ]
    return docs


def test_maxscore_topk_matches_full_scoring():
    from lancedb_tpu.index.fts import build_fts_index  # noqa: F401  (import check)
    from lancedb_tpu.index.fts import ColumnFtsIndex
    from lancedb_tpu.index.tokenizer import Tokenizer as Tok

    docs = _zipf_corpus()
    from lancedb_tpu.index.fts import _build_column_index

    ix = _build_column_index(
        docs, np.arange(len(docs), dtype=np.uint64), Tok(stem=False), with_position=False
    )
    q = "term1500 term3 term0 term900"  # rare + common mix
    full = ix.score_match(q)
    pruned = ix.score_match_topk(q, k=10)
    k = 10
    top_full = np.argsort(-full, kind="stable")[:k]
    top_pruned = np.argsort(-pruned, kind="stable")[:k]
    assert np.allclose(
        np.sort(full[top_full]), np.sort(pruned[top_pruned]), atol=1e-5
    )
    assert set(top_full) == set(top_pruned)
    # candidate scores are exact
    assert np.allclose(pruned[top_pruned], full[top_pruned], atol=1e-5)


def test_maxscore_engaged_e2e(tmp_db):
    docs = _zipf_corpus(n_docs=66_000)
    tbl = tmp_db.create_table(
        "big",
        pa.table({"text": pa.array(docs), "i": pa.array(range(len(docs)))}),
    )
    tbl.create_fts_index("text", with_position=False)
    out = tbl.search("term1500 term3").limit(5).to_arrow()
    assert out.num_rows == 5
    scores = out.column("_score").to_pylist()
    assert scores == sorted(scores, reverse=True)


class TestNativeDaatMaxScore:
    """Native BM25 DAAT MaxScore (ldb_bm25_maxscore_topk) vs the numpy
    dense scorer: exact score parity and dead-doc skipping."""

    @pytest.fixture(scope="class")
    def big_index(self):
        rng = np.random.default_rng(0)
        words = [f"w{i}" for i in range(2000)]
        zipf = rng.zipf(1.3, size=(70_000, 10)) % 2000
        texts = [" ".join(words[j] for j in row) for row in zipf]
        tbl = pa.table({
            "id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        })
        ds = Dataset.create(MemoryStore(), "t.lance", tbl.schema, tbl)
        meta = build_fts_index(ds, ["text"], FTS(with_position=False))
        ds.add_index(meta)
        return ds, meta, load_fts_index(ds, meta)

    def test_parity_with_numpy_scorer(self, big_index):
        from lancedb_tpu.native import native_available

        if not native_available():
            pytest.skip("native lib unavailable")
        _, _, idx = big_index
        col = idx._col("text")
        for q in ("w1 w17 w301 w4", "w0", "w1999 w1 w1"):
            docs, s = col.topk_match_native(q, 10)
            dense = col.score_match_topk(q, 10)
            part = np.argpartition(-dense, 9)[:10]
            np_top = part[np.argsort(-dense[part], kind="stable")]
            np.testing.assert_allclose(s, dense[np_top], rtol=1e-4)

    def test_parity_randomized_blockmax(self, big_index):
        """50 random queries through the block-max skip path (Zipf
        terms, mixed k, with/without dead mask) must score identically
        to the dense numpy scorer — guards the BMW block-skip logic."""
        from lancedb_tpu.native import native_available

        if not native_available():
            pytest.skip("native lib unavailable")
        _, _, idx = big_index
        col = idx._col("text")
        assert col.block_maxes()[0].size > 0
        rng = np.random.default_rng(7)
        for trial in range(50):
            n_terms = int(rng.integers(1, 6))
            toks = [f"w{(rng.zipf(1.3) - 1) % 2000}" for _ in range(n_terms)]
            q = " ".join(toks)
            k = int(rng.choice([1, 5, 10, 100]))
            dead = None
            if trial % 3 == 0:
                dead = (rng.random(col.num_docs) < 0.1).astype(np.uint8)
            docs, s = col.topk_match_native(q, k, dead)
            dense = col.score_match_topk(q, k)
            if dead is not None:
                dense = dense.copy()
                dense[dead.astype(bool)] = 0.0
            kk = min(k, int((dense > 0).sum()))
            assert len(docs) >= kk
            if kk == 0:
                continue
            part = np.argpartition(-dense, kk - 1)[:kk]
            np_top = part[np.argsort(-dense[part], kind="stable")]
            np.testing.assert_allclose(
                s[:kk], dense[np_top], rtol=1e-4,
                err_msg=f"q={q!r} k={k} dead={dead is not None}",
            )

    def test_dead_mask_skips_docs(self, big_index):
        from lancedb_tpu.native import native_available

        if not native_available():
            pytest.skip("native lib unavailable")
        _, _, idx = big_index
        col = idx._col("text")
        docs, s = col.topk_match_native("w1 w4", 5)
        dead = np.zeros(col.num_docs, dtype=np.uint8)
        dead[docs] = 1  # kill the current top-5
        docs2, s2 = col.topk_match_native("w1 w4", 5, dead)
        assert set(docs2.tolist()).isdisjoint(set(docs.tolist()))
        assert (s2 <= s[0] + 1e-6).all()

    def test_unknown_terms_empty(self, big_index):
        _, _, idx = big_index
        col = idx._col("text")
        out = col.topk_match_native("zzzz qqqq", 5)
        if out is not None:
            docs, s = out
            assert len(docs) == 0

    def test_pruned_query_path_end_to_end(self, big_index):
        """_execute_fts routes big OR queries through the native scorer
        (or numpy MaxScore) — results must match full dense evaluation."""
        ds, meta, idx = big_index
        from lancedb_tpu.index.fts import execute_fts_query

        class FakeTable:
            _dataset = ds

            def _get_fts_index(self, m):
                return idx

        out = execute_fts_query(FakeTable(), "w1 w17 w301", k=5)
        assert out.num_rows == 5
        scores = out.column("_score").to_pylist()
        assert scores == sorted(scores, reverse=True)


class TestNativeAndPhrase:
    """Native AND (ldb_bm25_and_topk) and phrase (ldb_phrase_topk)
    scorers vs the numpy dense fallbacks: exact score parity."""

    @pytest.fixture(scope="class")
    def pos_index(self):
        rng = np.random.default_rng(1)
        words = [f"w{i}" for i in range(500)]
        zipf = rng.zipf(1.3, size=(20_000, 12)) % 500
        texts = [" ".join(words[j] for j in row) for row in zipf]
        # salt in known phrases
        for i in range(0, 20_000, 97):
            texts[i] = texts[i] + " quick brown fox"
        tbl = pa.table({
            "id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        })
        ds = Dataset.create(MemoryStore(), "t.lance", tbl.schema, tbl)
        meta = build_fts_index(ds, ["text"], FTS(with_position=True))
        ds.add_index(meta)
        return ds, meta, load_fts_index(ds, meta)

    def test_and_parity_with_numpy(self, pos_index):
        from lancedb_tpu.native import native_available
        from lancedb_tpu.index.fts import Operator

        if not native_available():
            pytest.skip("native lib unavailable")
        _, _, idx = pos_index
        col = idx._col("text")
        for q in ("w1 w17 w3", "w0", "w1 w1 w2", "w499 w498"):
            docs, s = col.topk_and_native(q, 10)
            dense = col.score_match(q, operator=Operator.AND)
            kk = min(10, int((dense > 0).sum()))
            assert len(docs) == kk
            if kk:
                part = np.argpartition(-dense, kk - 1)[:kk]
                np_top = part[np.argsort(-dense[part], kind="stable")]
                np.testing.assert_allclose(
                    np.sort(s), np.sort(dense[np_top]), rtol=1e-4
                )
                # every returned doc matches ALL terms and scores exactly
                np.testing.assert_allclose(s, dense[docs], rtol=1e-4)

    def test_and_unknown_term_empty(self, pos_index):
        from lancedb_tpu.native import native_available

        if not native_available():
            pytest.skip("native lib unavailable")
        _, _, idx = pos_index
        col = idx._col("text")
        docs, s = col.topk_and_native("w1 zzzznope", 5)
        assert len(docs) == 0

    def test_phrase_parity_with_numpy(self, pos_index):
        from lancedb_tpu.native import native_available

        if not native_available():
            pytest.skip("native lib unavailable")
        _, _, idx = pos_index
        col = idx._col("text")
        for q, slop in (("quick brown fox", 0), ("quick fox", 0), ("quick fox", 1)):
            docs, s = col.topk_phrase_native(q, 10, slop=slop)
            dense = col.score_phrase(q, slop=slop)
            kk = min(10, int((dense > 0).sum()))
            assert len(docs) == kk
            if kk:
                part = np.argpartition(-dense, kk - 1)[:kk]
                np_top = part[np.argsort(-dense[part], kind="stable")]
                np.testing.assert_allclose(
                    np.sort(s), np.sort(dense[np_top]), rtol=1e-4
                )
                np.testing.assert_allclose(s, dense[docs], rtol=1e-4)

    def test_and_dead_mask(self, pos_index):
        from lancedb_tpu.native import native_available

        if not native_available():
            pytest.skip("native lib unavailable")
        _, _, idx = pos_index
        col = idx._col("text")
        docs, s = col.topk_and_native("w1 w2", 5)
        if len(docs) == 0:
            pytest.skip("no conjunctive matches in corpus")
        dead = np.zeros(col.num_docs, dtype=np.uint8)
        dead[docs] = 1
        docs2, _ = col.topk_and_native("w1 w2", 5, dead)
        assert set(docs2.tolist()).isdisjoint(set(docs.tolist()))

    def test_and_phrase_e2e(self, pos_index):
        """execute_fts_query routes AND / phrase nodes through the
        native scorers — results ranked descending, phrase hits only."""
        ds, meta, idx = pos_index
        from lancedb_tpu.index.fts import execute_fts_query
        from lancedb_tpu.query_fts import MatchQuery, PhraseQuery, Operator

        class FakeTable:
            _dataset = ds

            def _get_fts_index(self, m):
                return idx

        out = execute_fts_query(
            FakeTable(), MatchQuery("w1 w17", operator=Operator.AND), k=5
        )
        scores = out.column("_score").to_pylist()
        assert scores == sorted(scores, reverse=True)
        out = execute_fts_query(FakeTable(), PhraseQuery("quick brown fox"), k=5)
        assert out.num_rows == 5
        scores = out.column("_score").to_pylist()
        assert scores == sorted(scores, reverse=True)
