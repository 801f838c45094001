"""Singleton embedding registry (reference python embeddings/registry.py:
10-100): providers register by name; table schemas carry the embedding
config in Arrow schema metadata so reopening a table reconnects the
functions automatically."""

from __future__ import annotations

import json
from dataclasses import dataclass

import pyarrow as pa

from ..errors import EmbeddingFunctionNotFoundError
from .base import EmbeddingFunction

METADATA_KEY = b"embedding_functions"


@dataclass
class EmbeddingDefinition:
    """Binds a source column to a vector column via a named provider
    (reference rust embeddings.rs EmbeddingDefinition)."""

    source_column: str
    vector_column: str = "vector"
    function_name: str = ""
    config: dict | None = None


class EmbeddingFunctionRegistry:
    _instance: "EmbeddingFunctionRegistry | None" = None

    def __init__(self):
        self._functions: dict[str, type[EmbeddingFunction]] = {}
        self._variables: dict[str, str] = {}

    @classmethod
    def get_instance(cls) -> "EmbeddingFunctionRegistry":
        if cls._instance is None:
            cls._instance = cls()
            from . import multimodal, providers, rest_providers  # noqa: F401  (self-registration)
        return cls._instance

    # --- registration ----------------------------------------------------
    def register(self, alias: str | None = None):
        def decorator(klass: type[EmbeddingFunction]):
            name = alias or klass.name or klass.__name__
            klass.name = name
            self._functions[name] = klass
            return klass

        return decorator

    def get(self, name: str):
        if name not in self._functions:
            raise EmbeddingFunctionNotFoundError(
                f"no embedding function registered under {name!r}; "
                f"available: {sorted(self._functions)}"
            )
        klass = self._functions[name]

        class _Creator:
            def create(_self, **kwargs) -> EmbeddingFunction:
                return klass(**kwargs)

        return _Creator()

    def list_functions(self) -> list[str]:
        return sorted(self._functions)

    # --- variables (reference registry set_var/get_var) ------------------
    def set_var(self, name: str, value: str) -> None:
        self._variables[name] = value

    def get_var(self, name: str) -> str:
        return self._variables[name]

    # --- schema metadata round trip --------------------------------------
    def attach_metadata(self, schema: pa.Schema, definitions: list[EmbeddingDefinition]) -> pa.Schema:
        doc = [
            {
                "source_column": d.source_column,
                "vector_column": d.vector_column,
                "name": d.function_name,
                "model": d.config or {},
            }
            for d in definitions
        ]
        meta = dict(schema.metadata or {})
        meta[METADATA_KEY] = json.dumps(doc).encode()
        return schema.with_metadata(meta)

    def parse_functions_from_schema_metadata(self, raw: bytes) -> dict[str, EmbeddingFunction]:
        out = {}
        for entry in json.loads(raw):
            fn = self.get(entry["name"]).create(
                source_column=entry["source_column"], **entry.get("model", {})
            )
            fn.source_column = entry["source_column"]
            out[entry["vector_column"]] = fn
        return out


def get_registry() -> EmbeddingFunctionRegistry:
    """Module-level accessor (reference python get_registry())."""
    return EmbeddingFunctionRegistry.get_instance()
