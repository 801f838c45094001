"""Pydantic model integration + contextualizer tests (reference
test_pydantic.py / test_context.py territory)."""

from typing import Optional

import numpy as np
import pyarrow as pa
import pytest

import lancedb_tpu as ldb
from lancedb_tpu.context import contextualize
from lancedb_tpu.pydantic import LanceModel, MultiVector, Vector, pydantic_to_schema


class Item(LanceModel):
    id: int
    text: str
    price: float
    in_stock: bool = True
    note: Optional[str] = None
    vector: Vector(8)


class TestSchema:
    def test_schema_conversion(self):
        schema = Item.to_arrow_schema()
        assert schema.field("id").type == pa.int64()
        assert schema.field("text").type == pa.utf8()
        assert schema.field("price").type == pa.float64()
        assert schema.field("in_stock").type == pa.bool_()
        assert schema.field("note").nullable
        assert schema.field("vector").type == pa.list_(pa.float32(), 8)

    def test_nested_model(self):
        class Inner(LanceModel):
            a: int
            b: str

        class Outer(LanceModel):
            id: int
            meta: Inner

        schema = pydantic_to_schema(Outer)
        assert pa.types.is_struct(schema.field("meta").type)

    def test_list_and_dict(self):
        class M(LanceModel):
            tags: list[str]
            vector: Vector(4)

        schema = pydantic_to_schema(M)
        assert schema.field("tags").type == pa.list_(pa.utf8())

    def test_multivector(self):
        class M(LanceModel):
            id: int
            vecs: MultiVector(4)

        schema = pydantic_to_schema(M)
        assert schema.field("vecs").type == pa.list_(pa.list_(pa.float32(), 4))

    def test_vector_validation(self):
        with pytest.raises(Exception):
            Item(id=1, text="x", price=1.0, vector=[0.1, 0.2])  # wrong dim


class TestEndToEnd:
    def test_create_from_model(self, mem_db):
        t = mem_db.create_table("items", schema=Item)
        t.add([
            Item(id=1, text="apple pie", price=4.5, vector=[0.1] * 8),
            Item(id=2, text="banana bread", price=3.0, vector=[0.9] * 8),
        ])
        assert t.count_rows() == 2
        hits = t.search(np.full(8, 0.1, np.float32)).limit(1).to_pydantic(Item)
        assert isinstance(hits[0], Item)
        assert hits[0].id == 1

    def test_model_dicts_roundtrip(self, mem_db):
        t = mem_db.create_table("items2", schema=Item)
        t.add([{"id": 3, "text": "x", "price": 1.0, "in_stock": False, "note": None, "vector": [0.0] * 8}])
        row = t.to_arrow().to_pylist()[0]
        assert row["in_stock"] is False


class TestContextualizer:
    DOCS = [
        {"doc": "a", "text": "one two three four five six"},
        {"doc": "b", "text": "alpha beta gamma"},
    ]

    def test_window_stride(self):
        out = (
            contextualize(self.DOCS).text_col("text").groupby("doc").window(4).stride(2).to_list()
        )
        a_chunks = [r["text"] for r in out if r["doc"] == "a"]
        assert a_chunks[0] == "one two three four"
        assert a_chunks[1] == "three four five six"
        b_chunks = [r["text"] for r in out if r["doc"] == "b"]
        assert b_chunks == ["alpha beta gamma"]

    def test_min_window(self):
        out = (
            contextualize(self.DOCS)
            .text_col("text")
            .groupby("doc")
            .window(4)
            .stride(4)
            .min_window_size(3)
            .to_list()
        )
        assert all(len(r["text"].split()) >= 3 for r in out)

    def test_arrow_output(self):
        tbl = contextualize(self.DOCS).text_col("text").window(3).stride(3).to_arrow()
        assert "text" in tbl.column_names


class TestEnumTypes:
    """Enum fields map to their value-mixin Arrow type (reference
    test_pydantic.py test_enum_types / issue #1846)."""

    def test_enum_schema_and_roundtrip(self, mem_db):
        from enum import Enum
        from typing import Optional

        import pydantic

        from lancedb_tpu.pydantic import LanceModel, Vector, pydantic_to_schema

        class StrStatus(str, Enum):
            PENDING = "pending"
            DONE = "done"

        class IntPriority(int, Enum):
            LOW = 1
            HIGH = 3

        class M(pydantic.BaseModel):
            status: StrStatus
            priority: IntPriority
            opt_status: Optional[StrStatus] = None

        s = pydantic_to_schema(M)
        assert s.field("status").type == pa.dictionary(pa.int32(), pa.utf8())
        assert s.field("priority").type == pa.int64()
        assert s.field("opt_status").nullable

        class Doc(LanceModel):
            id: int
            status: StrStatus
            vector: Vector(2)

        t = mem_db.create_table("enum_rt", schema=Doc, mode="overwrite")
        t.add([Doc(id=1, status=StrStatus.PENDING, vector=[1.0, 0.0])])
        assert t.to_arrow().column("status").to_pylist() == ["pending"]
