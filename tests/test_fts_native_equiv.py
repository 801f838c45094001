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
