"""Native C++ runtime tests: equivalence with the pure-Python paths."""

import numpy as np
import pytest

from lancedb_tpu.index.fts import _build_column_index
from lancedb_tpu.index.tokenizer import Tokenizer, _porter_stem
from lancedb_tpu.native import fts_build_native, hash_join_native, native_available

pytestmark = pytest.mark.skipif(not native_available(), reason="native lib unavailable")

DOCS = [
    "The quick brown foxes are jumping over lazy dogs repeatedly",
    "Databases store information; vector databases store embeddings",
    None,
    "",
    "Running quickly through national rationalization conditional relational",
    "hello hello hello world",
    "café naïve résumé",  # ascii folding
]


def test_stemmer_equivalence():
    words = [
        "running", "flies", "dogs", "churches", "agreed", "plastered", "motoring",
        "sing", "conflated", "troubled", "sized", "hopping", "tanned", "falling",
        "hissing", "fizzed", "failing", "filing", "happy", "sky", "relational",
        "conditional", "rational", "valenci", "hesitanci", "digitizer",
        "conformabli", "radicalli", "differentli", "vileli", "analogousli",
        "vietnamization", "predication", "operator", "feudalism", "decisiveness",
        "hopefulness", "callousness", "formaliti", "sensitiviti", "sensibiliti",
        "triplicate", "formative", "formalize", "electriciti", "electrical",
        "hopeful", "goodness", "revival", "allowance", "inference", "airliner",
        "gyroscopic", "adjustable", "defensible", "irritant", "replacement",
        "adjustment", "dependent", "adoption", "homologou", "communism",
        "activate", "angulariti", "homologous", "effective", "bowdlerize",
        "probate", "rate", "cease", "controll", "roll",
    ]
    from lancedb_tpu import native as n
    import ctypes

    # check each word through the full pipeline (single-doc build)
    for w in words:
        res = fts_build_native([w], stem=True, remove_stop_words=False)
        vocab = res[0]
        py = _porter_stem(w.lower())
        assert vocab == [py], f"{w}: native={vocab} python={py!r}"


def test_fts_builder_equivalence():
    tok = Tokenizer()
    rowids = np.arange(len(DOCS), dtype=np.uint64)
    native = _build_column_index(list(DOCS), rowids, tok, with_position=True)
    # force the python path by asking for a non-simple base then fixing it
    tok2 = Tokenizer(base="whitespace")
    tok2.base = "simple"
    py = _build_column_index(list(DOCS), rowids, tok2, with_position=True)
    # python path via direct call (tok2.base simple but language check happens
    # before; emulate by calling the fallback through a raw-incompatible config)
    tok3 = Tokenizer(language="German", stem=False, remove_stop_words=False)
    # instead: compare native vs python on identical config by monkeypatch
    from lancedb_tpu.index import fts as fts_mod

    orig = fts_mod.fts_build_native if hasattr(fts_mod, "fts_build_native") else None
    import lancedb_tpu.native as native_mod

    real = native_mod.fts_build_native
    try:
        native_mod.fts_build_native = lambda *a, **k: None  # force python path
        py_index = _build_column_index(list(DOCS), rowids, tok, with_position=True)
    finally:
        native_mod.fts_build_native = real

    assert sorted(native.vocab) == sorted(py_index.vocab)
    # same postings per term
    for term, tid_n in native.vocab.items():
        tid_p = py_index.vocab[term]
        dn, tn = native.postings(tid_n)
        dp, tp = py_index.postings(tid_p)
        np.testing.assert_array_equal(dn, dp)
        np.testing.assert_array_equal(tn, tp)
    np.testing.assert_array_equal(native.doc_lens, py_index.doc_lens)
    # scoring identical
    q = "quick fox database"
    np.testing.assert_allclose(native.score_match(q), py_index.score_match(q), rtol=1e-6)
    np.testing.assert_allclose(
        native.score_phrase("store embeddings"), py_index.score_phrase("store embeddings"), rtol=1e-6
    )


def test_hash_join():
    src = [f"key-{i}".encode() for i in range(1000)]
    tgt = [f"key-{i}".encode() for i in range(500, 1500)]
    out = hash_join_native(src, tgt)
    assert out[0] == 500
    assert out[499] == 999
    assert (out[500:] == -1).all()


def test_hash_join_empty():
    assert hash_join_native([], [b"a"]).tolist() == [-1]


class TestSuffixArrayNative:
    def test_matches_numpy(self):
        from lancedb_tpu.native import suffix_array_native
        from lancedb_tpu.index.scalar import _suffix_array

        if suffix_array_native(b"x") is None:
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(0)
        for trial in range(4):
            n = int(rng.integers(5, 4000))
            text = bytes(rng.integers(1, 255, n, dtype=np.uint8))
            a = suffix_array_native(text)
            b = _suffix_array(np.frombuffer(text, dtype=np.uint8))
            np.testing.assert_array_equal(a, b)

    def test_known_string(self):
        from lancedb_tpu.native import suffix_array_native

        sa = suffix_array_native(b"banana")
        if sa is None:
            pytest.skip("native library unavailable")
        # suffixes sorted: a(5) ana(3) anana(1) banana(0) na(4) nana(2)
        np.testing.assert_array_equal(sa, [5, 3, 1, 0, 4, 2])


class TestVarintNative:
    def test_roundtrip(self):
        from lancedb_tpu.native import varint_decode_native, varint_encode_native

        vals = np.sort(np.random.default_rng(1).integers(0, 1 << 40, 5000))
        enc = varint_encode_native(vals)
        if enc is None:
            pytest.skip("native library unavailable")
        assert len(enc) < vals.nbytes  # actually compresses sorted ids
        out = varint_decode_native(enc, len(vals))
        np.testing.assert_array_equal(out, vals)

    def test_empty_and_single(self):
        from lancedb_tpu.native import varint_decode_native, varint_encode_native

        enc = varint_encode_native(np.array([], dtype=np.int64))
        if enc is None:
            pytest.skip("native library unavailable")
        assert varint_decode_native(enc, 0).shape == (0,)
        enc1 = varint_encode_native(np.array([12345678901234], dtype=np.int64))
        np.testing.assert_array_equal(varint_decode_native(enc1, 1), [12345678901234])
