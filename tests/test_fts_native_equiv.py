"""Randomized equivalence: the native DAAT scorers (MaxScore with
block-max pruning, galloping AND, positional phrase) must return the
same top-k as the dense python BM25 over random zipf corpora, random
queries, and random dead-doc masks. This is the pruning-correctness
oracle — a skip bound that is even slightly wrong surfaces here as a
missing or mis-scored hit."""

import numpy as np
import pytest

from lancedb_tpu.index.fts import ColumnFtsIndex, _build_column_index
from lancedb_tpu.index.tokenizer import Tokenizer
from lancedb_tpu.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native lib not built"
)


def _corpus(rng: np.random.Generator, n_docs: int, vocab: int = 300):
    """Zipf-ish corpus: term f"t{j}" with frequency ∝ 1/(j+2)."""
    weights = 1.0 / (np.arange(vocab) + 2.0)
    weights /= weights.sum()
    docs = []
    for _ in range(n_docs):
        length = int(rng.integers(3, 30))
        terms = rng.choice(vocab, size=length, p=weights)
        docs.append(" ".join(f"t{j}" for j in terms))
    return docs


def _index(docs) -> ColumnFtsIndex:
    tok = Tokenizer(base="simple", stem=False, remove_stop_words=False)
    rowids = np.arange(len(docs), dtype=np.uint64)
    return _build_column_index(docs, rowids, tok, with_position=True)


def _dense_topk(ix: ColumnFtsIndex, query: str, k: int, dead: np.ndarray | None):
    scores = ix.score_match(query)
    if dead is not None:
        scores = np.where(dead.astype(bool), 0.0, scores)
    order = np.argsort(-scores, kind="stable")
    hits = [(int(d), float(scores[d])) for d in order if scores[d] > 0][:k]
    return hits


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_maxscore_matches_dense(seed):
    rng = np.random.default_rng(seed)
    ix = _index(_corpus(rng, 3000))
    for trial in range(25):
        nt = int(rng.integers(1, 4))
        q = " ".join(f"t{int(rng.integers(0, 300))}" for _ in range(nt))
        dead = None
        if trial % 3 == 0:
            dead = (rng.random(ix.num_docs) < 0.2).astype(np.uint8)
        k = int(rng.integers(1, 25))
        native = ix.topk_match_native(q, k, dead)
        assert native is not None
        docs_n, scores_n = native
        dense = _dense_topk(ix, q, k, dead)
        assert len(docs_n) == len(dense), (q, k, len(docs_n), len(dense))
        # scores must match pairwise (ties may reorder docs)
        np.testing.assert_allclose(
            scores_n, [s for _, s in dense], rtol=1e-5, atol=1e-5
        )
        # and the doc set must agree up to equal-score ties at the cut
        if len(dense):
            cut = dense[-1][1]
            must_have = {d for d, s in dense if s > cut + 1e-6}
            assert must_have <= set(int(d) for d in docs_n)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
def test_impact2_stratified_matches_dense(seed):
    """The 2-term stratified pair scorer (ldb_bm25_impact2_topk) is
    exact on varying-length corpora (continuous contributions → many
    quantized strata), common/common and rare/common term mixes, and
    dead-doc masks — forced directly, bypassing the routing threshold."""
    from lancedb_tpu.native import bm25_impact2_topk_native

    rng = np.random.default_rng(200 + seed)
    ix = _index(_corpus(rng, 4000, vocab=120))
    strat = ix.impact_strata()
    for trial in range(30):
        # bias toward common terms (low ids) half the time
        if trial % 2 == 0:
            a, b = int(rng.integers(0, 8)), int(rng.integers(0, 8))
        else:
            a, b = int(rng.integers(0, 120)), int(rng.integers(0, 120))
        if a == b:
            b = (b + 1) % 120
        q = f"t{a} t{b}"
        tids = sorted(
            {t for t in (ix.vocab.get(f"t{x}") for x in (a, b)) if t is not None}
        )
        if len(tids) != 2:
            continue
        dead = None
        if trial % 3 == 0:
            dead = (rng.random(ix.num_docs) < 0.25).astype(np.uint8)
        k = int(rng.integers(1, 30))
        idf = np.array([ix.idf(t) for t in tids], dtype=np.float32)
        out = bm25_impact2_topk_native(
            ix.postings_docs, ix.postings_tf, ix.postings_offsets,
            *strat, np.asarray(tids, dtype=np.int32), idf, ix._doc_norm(),
            k, 1.2, dead,
        )
        assert out is not None, (q, k)
        docs_n, scores_n = out
        dense = _dense_topk(ix, q, k, dead)
        assert len(docs_n) == len(dense), (q, k, len(docs_n), len(dense))
        np.testing.assert_allclose(
            scores_n, [s for _, s in dense], rtol=1e-5, atol=1e-5
        )
        if len(dense):
            cut = dense[-1][1]
            must_have = {d for d, s in dense if s > cut + 1e-6}
            assert must_have <= set(int(d) for d in docs_n), (q, k)


def test_impact2_work_budget_falls_back():
    """A tiny work budget returns None (the caller's DAAT fallback)."""
    from lancedb_tpu.native import bm25_impact2_topk_native

    rng = np.random.default_rng(7)
    ix = _index(_corpus(rng, 3000, vocab=30))
    tids = sorted(v for kk, v in ix.vocab.items() if kk in ("t0", "t1"))
    idf = np.array([ix.idf(t) for t in tids], dtype=np.float32)
    out = bm25_impact2_topk_native(
        ix.postings_docs, ix.postings_tf, ix.postings_offsets,
        *ix.impact_strata(), np.asarray(tids, dtype=np.int32), idf,
        ix._doc_norm(), 10, 1.2, None, max_work=4,
    )
    assert out is None


def test_impact2_routing_through_match_native(monkeypatch):
    """topk_match_native routes 2-term ORs through the stratified
    scorer once past IMPACT2_MIN_POSTINGS; results stay exact."""
    rng = np.random.default_rng(9)
    ix = _index(_corpus(rng, 3000, vocab=60))
    monkeypatch.setattr(ColumnFtsIndex, "IMPACT2_MIN_POSTINGS", 1)
    for a, b in ((0, 1), (0, 5), (2, 40)):
        q = f"t{a} t{b}"
        native = ix.topk_match_native(q, 12, None)
        assert native is not None
        dense = _dense_topk(ix, q, 12, None)
        np.testing.assert_allclose(
            native[1], [s for _, s in dense], rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize("seed", [0, 1])
def test_phrase_matches_positions(seed):
    rng = np.random.default_rng(100 + seed)
    docs = _corpus(rng, 1500, vocab=50)
    ix = _index(docs)
    for _ in range(15):
        a, b = int(rng.integers(0, 50)), int(rng.integers(0, 50))
        q = f"t{a} t{b}"
        native = ix.topk_phrase_native(q, 20)
        assert native is not None
        docs_n, _ = native
        # oracle: substring match on the tokenized text
        expect = {
            i for i, d in enumerate(docs)
            if f" t{a} t{b} " in f" {d} "
        }
        got = set(int(x) for x in docs_n)
        assert got <= expect
        assert len(got) == min(20, len(expect)), (q, len(got), len(expect))


class TestImpactScorer:
    """The impact-ordered TA scorer (common-term fast path) must agree
    with the DAAT MaxScore scorer exactly — scores and (score, doc)
    ordering — including under dead-doc masks."""

    def _index(self, n=4000, seed=3):
        import lancedb_tpu
        from lancedb_tpu.index.fts import load_fts_index

        rng = np.random.default_rng(seed)
        ranks = np.clip(rng.zipf(1.25, size=n * 12), 1, 800) - 1
        docs = [" ".join(f"w{r}" for r in row) for row in ranks.reshape(n, 12)]
        db = lancedb_tpu.connect(f"memory://impact-eq-{seed}")
        t = db.create_table("d", {"id": np.arange(n), "text": docs})
        t.create_fts_index("text", with_position=False)
        ds = t.to_lance()
        meta = [m for m in ds.manifest.indices if m.index_type == "FTS"][0]
        return load_fts_index(ds, meta).by_column["text"]

    def test_impact_matches_maxscore(self):
        from lancedb_tpu.index.fts import K1
        from lancedb_tpu.native import (
            bm25_impact_topk_native,
            bm25_maxscore_topk_native,
        )

        s = self._index()
        rng = np.random.default_rng(0)
        norm = s._doc_norm()
        io_ = s.impact_order()
        bm, bo = s.block_maxes()
        for trial in range(25):
            n_terms = rng.integers(1, 4)
            words = [f"w{r}" for r in rng.integers(0, 60, size=n_terms)]
            tids = sorted({s.vocab[w] for w in words if w in s.vocab})
            if not tids:
                continue
            idf = np.array([s.idf(t) for t in tids], dtype=np.float32)
            k = int(rng.integers(1, 20))
            dead = None
            if trial % 3 == 0:
                dead = np.zeros(s.num_docs, dtype=np.uint8)
                dead[rng.integers(0, s.num_docs, s.num_docs // 10)] = 1
            a = bm25_impact_topk_native(
                s.postings_docs, s.postings_tf, s.postings_offsets, io_,
                np.asarray(tids, np.int32), idf, norm, k, K1, dead,
            )
            b = bm25_maxscore_topk_native(
                s.postings_docs, s.postings_tf, s.postings_offsets,
                np.asarray(tids, np.int32), idf, norm, k, K1, dead,
                qub=s.term_upper_bounds()[tids], block_max=bm, block_offsets=bo,
            )
            assert a is not None and b is not None
            np.testing.assert_allclose(a[1], b[1], rtol=1e-5, atol=1e-6), trial
            # docs may differ only among tied scores
            sa, sb = a[1], b[1]
            for da, db_, va, vb in zip(a[0], b[0], sa, sb):
                if da != db_:
                    assert abs(va - vb) <= 1e-5 * max(abs(va), 1.0)

    def test_impact_routing_threshold(self, monkeypatch):
        """Queries over a large posting mass route to the impact scorer."""
        from lancedb_tpu.index import fts as F

        s = self._index(seed=4)
        monkeypatch.setattr(F.ColumnFtsIndex, "IMPACT_MIN_POSTINGS", 1)
        out = s.topk_match_native("w0 w1", 10, None)
        assert out is not None and len(out[0]) == 10
        # matches the python dense scorer end to end
        dense = s.score_match("w0 w1", F.Operator.OR, 0, 50)
        top_dense = np.argsort(-dense, kind="stable")[:10]
        np.testing.assert_allclose(
            np.sort(out[1])[::-1], np.sort(dense[top_dense])[::-1], rtol=1e-5
        )

    def test_pop_budget_bails_to_none(self):
        """max_pops smaller than the required sorted access returns None
        (the routing layer then falls back to the DAAT scorer)."""
        from lancedb_tpu.index.fts import K1
        from lancedb_tpu.native import bm25_impact_topk_native

        s = self._index(seed=5)
        tids = sorted({s.vocab[w] for w in ("w0", "w1", "w2") if w in s.vocab})
        idf = np.array([s.idf(t) for t in tids], dtype=np.float32)
        unbounded = bm25_impact_topk_native(
            s.postings_docs, s.postings_tf, s.postings_offsets,
            s.impact_order(), np.asarray(tids, np.int32), idf,
            s._doc_norm(), 10, K1, None,
        )
        assert unbounded is not None
        bailed = bm25_impact_topk_native(
            s.postings_docs, s.postings_tf, s.postings_offsets,
            s.impact_order(), np.asarray(tids, np.int32), idf,
            s._doc_norm(), 10, K1, None, max_pops=1,
        )
        assert bailed is None
        # a budget big enough to converge returns identical scores
        big = bm25_impact_topk_native(
            s.postings_docs, s.postings_tf, s.postings_offsets,
            s.impact_order(), np.asarray(tids, np.int32), idf,
            s._doc_norm(), 10, K1, None, max_pops=10_000_000,
        )
        assert big is not None
        np.testing.assert_allclose(big[1], unbounded[1], rtol=1e-6)

    def test_routed_path_still_exact_with_budget(self, monkeypatch):
        """topk_match_native with the production pop budget stays exact
        (bail-outs land on the DAAT scorer, never on wrong results)."""
        from lancedb_tpu.index import fts as F

        s = self._index(seed=6)
        monkeypatch.setattr(F.ColumnFtsIndex, "IMPACT_MIN_POSTINGS", 1)
        for q in ("w0 w1 w2", "w0 w3 w7 w11", "w1"):
            out = s.topk_match_native(q, 10, None)
            dense = s.score_match(q, F.Operator.OR, 0, 50)
            top_dense = np.argsort(-dense, kind="stable")[:10]
            np.testing.assert_allclose(
                np.sort(out[1])[::-1], np.sort(dense[top_dense])[::-1], rtol=1e-5
            )
