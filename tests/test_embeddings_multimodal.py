"""Multimodal + multi-vector provider tests (reference embeddings/
colpali.py, open_clip.py, siglip.py, instructor.py contracts). Model
weights are not downloadable here, so encoding is exercised through a
deterministic fake encoder while all surrounding machinery — sanitize,
pooling, registry, multivector table wiring — runs for real."""

import io

import numpy as np
import pytest

from lancedb_tpu.embeddings import get_registry
from lancedb_tpu.embeddings.multimodal import (
    ColPaliEmbedding,
    MultiVectorEmbeddingFunction,
    hierarchical_token_pool,
    sanitize_images,
)

EXPECTED_PROVIDERS = {
    "bedrock-text", "cohere", "colpali", "gemini-text", "gte-text", "hash",
    "huggingface", "imagebind", "instructor", "jinaai", "ollama",
    "open-clip", "openai", "sentence-transformers", "siglip", "voyageai",
    "watsonx",
}


def test_registry_breadth():
    assert EXPECTED_PROVIDERS <= set(get_registry().list_functions())


class TestSanitizeImages:
    def _png_bytes(self):
        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (4, 4), (250, 10, 10)).save(buf, format="PNG")
        return buf.getvalue()

    def test_pil_bytes_path(self, tmp_path):
        from PIL import Image

        raw = self._png_bytes()
        p = tmp_path / "img.png"
        p.write_bytes(raw)
        ims = sanitize_images([Image.new("L", (2, 2)), raw, str(p), f"file://{p}"])
        assert len(ims) == 4
        assert all(im.mode == "RGB" for im in ims)

    def test_bad_input(self):
        from lancedb_tpu.errors import InvalidInputError

        with pytest.raises(InvalidInputError):
            sanitize_images([123])


class TestHierarchicalPool:
    def test_halves_count(self):
        v = np.random.default_rng(0).standard_normal((16, 8)).astype(np.float32)
        out = hierarchical_token_pool(v, 2)
        assert out.shape == (8, 8)

    def test_deterministic(self):
        v = np.random.default_rng(1).standard_normal((10, 4)).astype(np.float32)
        np.testing.assert_array_equal(
            hierarchical_token_pool(v, 2), hierarchical_token_pool(v, 2)
        )

    def test_keeps_at_least_one(self):
        v = np.ones((3, 4), dtype=np.float32)
        assert hierarchical_token_pool(v, 100).shape[0] == 1

    def test_noop_factor_one(self):
        v = np.ones((5, 4), dtype=np.float32)
        assert hierarchical_token_pool(v, 1) is v


class _FakeColPali(ColPaliEmbedding):
    """Deterministic encoder: each item hashes to a (n_tokens, DIM) bag."""

    DIM = 16

    def _encode(self, items, is_query):
        out = []
        for it in items:
            seed = abs(hash(str(it))) % (2**31)
            n = 4 if is_query else 8
            out.append(
                np.random.default_rng(seed).standard_normal((n, self.DIM)).astype(np.float32)
            )
        return out


def test_colpali_pooling_applied_to_sources_not_queries():
    fn = _FakeColPali(pool_factor=2)
    bags = fn.compute_source_embeddings(["a", "b"])
    assert [b.shape for b in bags] == [(4, 16), (4, 16)]  # 8 pooled to 4
    q = fn.compute_query_embeddings("a")
    assert q[0].shape == (4, 16)  # queries unpooled


def test_colpali_is_multivector():
    assert issubclass(ColPaliEmbedding, MultiVectorEmbeddingFunction)


def test_multivector_table_end_to_end(mem_db):
    """A multi-vector provider feeds the multivector column + MaxSim
    search path through create_table(embedding_functions=...)."""
    from lancedb_tpu.embeddings import EmbeddingDefinition
    from lancedb_tpu.embeddings.registry import EmbeddingFunctionRegistry

    reg = EmbeddingFunctionRegistry.get_instance()
    reg.register("fake-colpali")(_FakeColPali)
    try:
        t = mem_db.create_table(
            "pages",
            [{"text": "alpha"}, {"text": "bravo"}, {"text": "charlie"}],
            embedding_functions=[
                EmbeddingDefinition(
                    source_column="text",
                    vector_column="embedding",
                    function_name="fake-colpali",
                    config={"ndims": _FakeColPali.DIM, "pooling_strategy": "none"},
                )
            ],
        )
        assert t.count_rows() == 3
        import pyarrow as pa

        field = t.schema.field("embedding")
        assert pa.types.is_list(field.type)
        assert pa.types.is_fixed_size_list(field.type.value_type)
        # query with the raw bag of the known row: MaxSim must rank it first
        fn = _FakeColPali(pooling_strategy="none")
        qbag = fn._encode(["bravo"], is_query=False)[0]
        hits = t.search(qbag, vector_column_name="embedding").limit(1).to_list()
        assert hits[0]["text"] == "bravo"
    finally:
        reg._functions.pop("fake-colpali", None)


def test_clip_like_text_vs_image_routing():
    """Input routing: plain strings go to the text tower, image-ish
    inputs to the image tower (no model load needed)."""
    from lancedb_tpu.embeddings.multimodal import OpenClipEmbedding

    calls = []

    class _Fake(OpenClipEmbedding):
        def _embed_text(self, texts):
            calls.append(("text", tuple(texts)))
            return np.zeros((len(texts), 4), dtype=np.float32)

        def _embed_images(self, images):
            calls.append(("image", len(images)))
            return np.zeros((len(images), 4), dtype=np.float32)

    fn = _Fake(ndims=4)
    fn.compute_query_embeddings("a dog")
    fn.compute_source_embeddings(["x.png", "y.jpg"])
    assert calls == [("text", ("a dog",)), ("image", 2)]
