"""REST + ColBERT reranker tests (reference rerankers/cohere.py,
jinaai.py, voyageai.py, openai.py, watsonx.py, colbert.py) against a
localhost mock, the embeddings-mock pattern."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pyarrow as pa
import pytest

from lancedb_tpu.rerankers import (
    CohereReranker,
    ColbertReranker,
    JinaReranker,
    OpenaiReranker,
    VoyageaiReranker,
    WatsonxReranker,
)


def _relevance(query: str, doc: str) -> float:
    """Deterministic mock scoring: token overlap."""
    q = set(query.lower().split())
    d = set(doc.lower().split())
    return len(q & d) / max(len(q), 1)


class _MockRerankApi(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):
        raw = self.rfile.read(int(self.headers["content-length"]))
        try:
            body = json.loads(raw)
        except ValueError:
            body = {}
        path = self.path.split("?")[0]
        if path in ("/v2/rerank", "/v1/rerank"):
            docs = body["documents"]
            results = [
                {"index": i, "relevance_score": _relevance(body["query"], d)}
                for i, d in enumerate(docs)
            ]
            return self._json(200, {"results": results})
        if path == "/identity/token":
            return self._json(200, {"access_token": "tok-1"})
        if path == "/ml/v1/text/rerank":
            results = [
                {"index": i, "score": _relevance(body["query"], d["text"])}
                for i, d in enumerate(body["inputs"])
            ]
            return self._json(200, {"results": results})
        if path == "/v1/chat/completions":
            # parse numbered docs back out of the prompt
            prompt = body["messages"][0]["content"]
            qline = [l for l in prompt.splitlines() if l.startswith("Query: ")][0]
            query = qline[len("Query: "):]
            docs = []
            for line in prompt.splitlines():
                if line.startswith("[") and "] " in line:
                    docs.append(line.split("] ", 1)[1])
            order = sorted(range(len(docs)), key=lambda i: -_relevance(query, docs[i]))
            return self._json(
                200, {"choices": [{"message": {"content": json.dumps(order)}}]}
            )
        return self._json(404, {"error": path})

    def _json(self, code, obj):
        payload = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("content-type", "application/json")
        self.send_header("content-length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture(scope="module")
def mock_api():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _MockRerankApi)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _results():
    vec = pa.table({
        "_rowid": pa.array([0, 1], pa.uint64()),
        "text": ["slow green turtle", "quick brown fox"],
        "_distance": pa.array([0.1, 0.4], pa.float32()),
    })
    fts = pa.table({
        "_rowid": pa.array([2, 1], pa.uint64()),
        "text": ["lazy dog sleeps", "quick brown fox"],
        "_score": pa.array([3.0, 1.0], pa.float32()),
    })
    return vec, fts


@pytest.mark.parametrize(
    "cls,kwargs",
    [
        (CohereReranker, {}),
        (JinaReranker, {}),
        (VoyageaiReranker, {}),
        (WatsonxReranker, {"project_id": "p1", "iam_url": None}),
        (OpenaiReranker, {}),
    ],
)
def test_rest_reranker_orders_by_relevance(mock_api, cls, kwargs):
    if "iam_url" in kwargs:
        kwargs["iam_url"] = mock_api
    rr = cls(api_key="k", base_url=mock_api, **kwargs)
    vec, fts = _results()
    out = rr.rerank_hybrid("quick brown fox", vec, fts)
    texts = out.column("text").to_pylist()
    assert texts[0] == "quick brown fox"
    scores = out.column("_relevance_score").to_pylist()
    assert scores == sorted(scores, reverse=True)
    # dedup: rowid 1 appears once
    assert len(out.filter(pa.compute.equal(out.column("_rowid"), 1))) == 1


def test_rest_reranker_vector_only(mock_api):
    rr = CohereReranker(api_key="k", base_url=mock_api)
    vec, _ = _results()
    out = rr.rerank_vector("quick brown fox", vec)
    assert out.column("text")[0].as_py() == "quick brown fox"


def test_missing_key_raises(mock_api, monkeypatch):
    monkeypatch.delenv("COHERE_API_KEY", raising=False)
    rr = CohereReranker(base_url=mock_api)
    vec, fts = _results()
    from lancedb_tpu.errors import InvalidInputError

    with pytest.raises(InvalidInputError, match="COHERE_API_KEY"):
        rr.rerank_hybrid("x", vec, fts)


class _FakeColbert(ColbertReranker):
    """Word-overlap token encoder: each word hashes to a one-hot-ish
    vector so MaxSim == token overlap."""

    def _encode(self, texts):
        out = []
        for t in texts:
            words = t.lower().split() or ["_"]
            vecs = np.zeros((len(words), 32), np.float32)
            for i, w in enumerate(words):
                vecs[i, hash(w) % 32] = 1.0
            out.append(vecs)
        return out


def test_colbert_maxsim_reranker():
    rr = _FakeColbert()
    vec, fts = _results()
    out = rr.rerank_hybrid("quick brown fox", vec, fts)
    assert out.column("text")[0].as_py() == "quick brown fox"
    scores = out.column("_relevance_score").to_pylist()
    assert scores == sorted(scores, reverse=True)


def test_all_reference_rerankers_exported():
    import lancedb_tpu.rerankers as R

    for name in ("RRFReranker", "LinearCombinationReranker", "CrossEncoderReranker",
                 "CohereReranker", "JinaReranker", "VoyageaiReranker",
                 "OpenaiReranker", "WatsonxReranker", "ColbertReranker",
                 "AnswerdotaiRerankers", "MRRReranker"):
        assert hasattr(R, name), name
