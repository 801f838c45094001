"""Model-based rerankers.

Reference ships 13 reranker impls (python rerankers/). The local-model
ones work here when weights exist on disk; API-backed ones are gated
(zero egress) with clear errors — same pattern as the embedding
providers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import RELEVANCE_COL, Reranker


class CrossEncoderReranker(Reranker):
    """sentence-transformers CrossEncoder scoring (reference
    rerankers/cross_encoder.py). Needs local model weights."""

    def __init__(
        self,
        model_name: str = "cross-encoder/ms-marco-TinyBERT-L-6",
        column: str = "text",
        device: str = "cpu",
        return_score: str = "relevance",
    ):
        super().__init__(return_score)
        self.column = column
        try:
            from sentence_transformers import CrossEncoder

            self._model = CrossEncoder(model_name, device=device)
        except Exception as e:  # pragma: no cover - env dependent
            raise RuntimeError(
                f"CrossEncoder model {model_name!r} unavailable "
                f"(no network; provide local weights): {e}"
            ) from None

    def _score(self, query: str, tbl: pa.Table) -> pa.Table:
        docs = tbl.column(self.column).to_pylist()
        scores = np.asarray(self._model.predict([(query, d or "") for d in docs]))
        tbl = tbl.append_column(RELEVANCE_COL, pa.array(scores.astype(np.float32)))
        order = np.argsort(-scores)
        return self._keep_score_columns(tbl.take(pa.array(order)))

    def rerank_hybrid(self, query, vector_results, fts_results):
        return self._score(query, self.merge_results(vector_results, fts_results))

    def rerank_vector(self, query, vector_results):
        return self._score(query, vector_results)

    def rerank_fts(self, query, fts_results):
        return self._score(query, fts_results)


def _api_stub(name: str, hint: str):
    class _Stub(Reranker):  # pragma: no cover - gated
        def __init__(self, *a, **k):
            raise RuntimeError(
                f"{name} requires network access to {hint}, unavailable in this environment"
            )

    _Stub.__name__ = name
    return _Stub


CohereReranker = _api_stub("CohereReranker", "api.cohere.ai")
OpenaiReranker = _api_stub("OpenaiReranker", "api.openai.com")
JinaReranker = _api_stub("JinaReranker", "api.jina.ai")
VoyageaiReranker = _api_stub("VoyageaiReranker", "api.voyageai.com")
WatsonxReranker = _api_stub("WatsonxReranker", "IBM watsonx.ai")
ColbertReranker = _api_stub("ColbertReranker", "colbert model weights (answerdotai/rerankers)")
AnswerdotaiRerankers = _api_stub("AnswerdotaiRerankers", "rerankers package models")
