"""REST embedding providers against a localhost mock — the reference's
ci/mock_openai.py pattern: providers point base_url at a stdlib HTTP
server returning deterministic embeddings, so the full request/response
shaping is exercised without network egress."""

import hashlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from lancedb_tpu.embeddings import get_registry

DIM = 8
get_registry().set_var("test_api_key", "k")


def _vec(text: str) -> list[float]:
    h = np.frombuffer(hashlib.sha256(text.encode()).digest()[: DIM * 4], dtype=np.uint32)
    return (h / np.uint32(0xFFFFFFFF)).astype(float).tolist()


class _MockApi(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_POST(self):
        raw = self.rfile.read(int(self.headers["content-length"]))
        try:
            body = json.loads(raw)
        except ValueError:  # form-encoded (watsonx IAM token exchange)
            body = {}
        path = self.path.split("?")[0]
        if path == "/v1/embeddings":  # openai / voyage / jina shape
            if "authorization" not in self.headers:
                return self._json(401, {"error": "missing auth"})
            data = [
                {"index": i, "embedding": _vec(t)} for i, t in enumerate(body["input"])
            ]
            return self._json(200, {"data": data})
        if path == "/v2/embed":  # cohere shape
            return self._json(
                200, {"embeddings": {"float": [_vec(t) for t in body["texts"]]}}
            )
        if path.startswith("/v1beta/models/"):  # gemini shape
            embs = [
                {"values": _vec(r["content"]["parts"][0]["text"])}
                for r in body["requests"]
            ]
            return self._json(200, {"embeddings": embs})
        if path == "/api/embed":  # ollama shape
            return self._json(200, {"embeddings": [_vec(t) for t in body["input"]]})
        if path.startswith("/model/") and path.endswith("/invoke"):  # bedrock
            auth = self.headers.get("authorization", "")
            if "AWS4-HMAC-SHA256" not in auth or "Signature=" not in auth:
                return self._json(403, {"error": "bad sigv4"})
            if "texts" in body:  # cohere-on-bedrock shape
                return self._json(200, {"embeddings": [_vec(t) for t in body["texts"]]})
            return self._json(200, {"embedding": _vec(body["inputText"])})
        if path == "/identity/token":  # watsonx IAM exchange
            return self._json(200, {"access_token": "tok-123"})
        if path == "/ml/v1/text/embeddings":  # watsonx shape
            if self.headers.get("authorization") != "Bearer tok-123":
                return self._json(401, {"error": "bad token"})
            if "project_id" not in body and "space_id" not in body:
                return self._json(400, {"error": "missing project"})
            return self._json(
                200, {"results": [{"embedding": _vec(t)} for t in body["inputs"]]}
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
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _MockApi)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("openai", {"api_key": "$var:test_api_key"}),
        ("voyageai", {"api_key": "$var:test_api_key"}),
        ("jinaai", {"api_key": "$var:test_api_key"}),
        ("cohere", {"api_key": "$var:test_api_key"}),
        ("gemini-text", {"api_key": "$var:test_api_key"}),
        ("ollama", {}),
    ],
)
def test_provider_roundtrip(mock_api, name, kwargs):
    fn = get_registry().get(name).create(base_url=mock_api, ndims=DIM, **kwargs)
    embs = fn.compute_source_embeddings(["hello", "world"])
    assert embs.shape == (2, DIM)
    np.testing.assert_allclose(embs[0], _vec("hello"), rtol=1e-6)
    q = fn.compute_query_embeddings("hello")
    np.testing.assert_allclose(q[0], embs[0], rtol=1e-6)
    assert fn.ndims() == DIM


def test_bedrock_titan_and_cohere(mock_api, monkeypatch):
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "AKIATEST")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "secret")
    fn = get_registry().get("bedrock-text").create(base_url=mock_api, ndims=DIM)
    embs = fn.compute_source_embeddings(["hello", "world"])
    assert embs.shape == (2, DIM)
    np.testing.assert_allclose(embs[0], _vec("hello"), rtol=1e-6)
    fn2 = (
        get_registry()
        .get("bedrock-text")
        .create(base_url=mock_api, model="cohere.embed-english-v3", ndims=DIM)
    )
    embs2 = fn2.compute_source_embeddings(["hello"])
    np.testing.assert_allclose(embs2[0], _vec("hello"), rtol=1e-6)


def test_watsonx_token_exchange(mock_api):
    fn = (
        get_registry()
        .get("watsonx")
        .create(base_url=mock_api, iam_url=mock_api, api_key="$var:test_api_key", project_id="p1", ndims=DIM)
    )
    embs = fn.compute_source_embeddings(["hello", "world"])
    assert embs.shape == (2, DIM)
    np.testing.assert_allclose(embs[1], _vec("world"), rtol=1e-6)


def test_watsonx_requires_project_or_space(mock_api):
    from lancedb_tpu.errors import InvalidInputError

    with pytest.raises(InvalidInputError):
        get_registry().get("watsonx").create(base_url=mock_api, api_key="$var:test_api_key")
    with pytest.raises(InvalidInputError):
        get_registry().get("watsonx").create(
            base_url=mock_api, api_key="$var:test_api_key", project_id="a", space_id="b"
        )


def test_missing_api_key_message(mock_api, monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    fn = get_registry().get("openai").create(base_url=mock_api, ndims=DIM)
    with pytest.raises(Exception, match="OPENAI_API_KEY"):
        fn.compute_source_embeddings(["x"])


def test_batching_chunks_requests(mock_api):
    fn = get_registry().get("openai").create(base_url=mock_api, api_key="$var:test_api_key", ndims=DIM)
    texts = [f"t{i}" for i in range(301)]  # > 2 x max_batch(128)
    embs = fn.compute_source_embeddings(texts)
    assert embs.shape == (301, DIM)
    np.testing.assert_allclose(embs[300], _vec("t300"), rtol=1e-6)


def test_table_auto_embedding(mock_api, mem_db):
    """End-to-end: a table with an embedding definition embeds source
    text on add and text queries at search (reference WithEmbeddings)."""
    from lancedb_tpu.embeddings import EmbeddingDefinition

    t = mem_db.create_table(
        "docs",
        [{"text": "alpha"}, {"text": "bravo"}, {"text": "charlie"}],
        embedding_functions=[
            EmbeddingDefinition(
                source_column="text",
                vector_column="vector",
                function_name="openai",
                config={"base_url": mock_api, "api_key": "$var:test_api_key", "ndims": DIM},
            )
        ],
    )
    assert t.count_rows() == 3
    hits = t.search("bravo").limit(1).to_list()
    assert hits[0]["text"] == "bravo"
    assert hits[0]["_distance"] < 1e-5


def test_source_field_vector_field(mock_api, mem_db):
    """SourceField/VectorField markers on a LanceModel become embedding
    definitions at create_table (reference embeddings/base.py:176-188 +
    table.py parse_embedding_functions): add() embeds the source text,
    search(str) embeds the query."""
    from lancedb_tpu.pydantic import LanceModel, Vector
    from lancedb_tpu.embeddings import get_registry

    fn = get_registry().get("openai").create(
        base_url=mock_api, api_key="$var:test_api_key", ndims=DIM)

    class Doc(LanceModel):
        text: str = fn.SourceField()
        vector: Vector(DIM) = fn.VectorField()

    t = mem_db.create_table("sfvf", schema=Doc)
    t.add([{"text": "alpha"}, {"text": "bravo"}])
    hits = t.search("bravo").limit(1).to_list()
    assert hits[0]["text"] == "bravo"
    assert hits[0]["_distance"] < 1e-5
    # config round-trips through schema metadata: reopening reconnects
    t2 = mem_db.open_table("sfvf")
    t2.add([{"text": "charlie"}])
    assert t2.search("charlie").limit(1).to_list()[0]["text"] == "charlie"


def test_source_field_default_vector_column(mock_api, mem_db):
    """A SourceField with no VectorField targets the default `vector`
    column, which create_table appends sized by the provider."""
    from lancedb_tpu.pydantic import LanceModel
    from lancedb_tpu.embeddings import get_registry

    fn = get_registry().get("openai").create(
        base_url=mock_api, api_key="$var:test_api_key", ndims=DIM)

    class Doc(LanceModel):
        text: str = fn.SourceField()

    t = mem_db.create_table("sfonly", schema=Doc)
    assert "vector" in t.schema.names
    t.add([{"text": "delta"}])
    assert t.search("delta").limit(1).to_list()[0]["text"] == "delta"


def test_orphan_vector_field_rejected(mock_api, mem_db):
    from lancedb_tpu.pydantic import LanceModel, Vector
    from lancedb_tpu.embeddings import get_registry
    from lancedb_tpu.errors import InvalidInputError

    fn = get_registry().get("openai").create(
        base_url=mock_api, api_key="$var:test_api_key", ndims=DIM)

    class Doc(LanceModel):
        vector: Vector(DIM) = fn.VectorField()

    with pytest.raises(InvalidInputError, match="SourceField"):
        mem_db.create_table("orphan", schema=Doc)


def test_sensitive_key_rejected_and_var_persisted(mock_api, mem_db):
    """Hardcoded api_key at create() is refused; a $var: reference works
    and is what lands in the table's schema metadata — never the secret
    (reference embeddings/base.py:46-70 __resolveVariables)."""
    from lancedb_tpu.errors import InvalidInputError

    with pytest.raises(InvalidInputError, match="sensitive"):
        get_registry().get("openai").create(base_url=mock_api, api_key="topsecret")

    get_registry().set_var("sk_test", "k")
    fn = get_registry().get("openai").create(
        base_url=mock_api, api_key="$var:sk_test", ndims=DIM)
    assert fn._api_key == "k"  # resolved for use

    from lancedb_tpu.embeddings import EmbeddingDefinition

    t = mem_db.create_table(
        "sek", [{"text": "x"}],
        embedding_functions=[EmbeddingDefinition(
            source_column="text", function_name="openai",
            config={"base_url": mock_api, "api_key": "$var:sk_test",
                    "ndims": DIM},
        )],
    )
    raw = t.schema.metadata[b"embedding_functions"].decode()
    assert "$var:sk_test" in raw and "topsecret" not in raw and '"k"' not in raw


def test_var_default_and_validation():
    from lancedb_tpu.errors import InvalidInputError

    reg = get_registry()
    with pytest.raises(InvalidInputError, match="colon"):
        reg.set_var("a:b", "v")
    with pytest.raises(InvalidInputError, match="not set"):
        reg.get("openai").create(api_key="$var:nope", ndims=DIM)
    fn = reg.get("openai").create(api_key="$var:nope:fallback", ndims=DIM)
    assert fn._api_key == "fallback"


def test_registry_config_roundtrip(mock_api):
    """EmbeddingFunctionConfig + get_table_metadata/parse_functions
    (reference registry.py:91-158): instance-level configs round-trip
    through Arrow schema metadata."""
    from lancedb_tpu.embeddings import EmbeddingFunctionConfig

    reg = get_registry()
    reg.set_var("rk", "k")
    fn = reg.get("openai").create(base_url=mock_api, api_key="$var:rk", ndims=DIM)
    meta = reg.get_table_metadata([
        EmbeddingFunctionConfig(function=fn, source_column="text")
    ])
    assert "embedding_functions" in meta
    parsed = reg.parse_functions({k.encode(): v for k, v in meta.items()})
    assert parsed["vector"].source_column == "text"
    assert parsed["vector"].function.ndims() == DIM
    assert reg.parse_functions(None) == {} and reg.parse_functions({}) == {}
