from .base import EmbeddingFunction, TextEmbeddingFunction
from .registry import (
    EmbeddingDefinition,
    EmbeddingFunctionRegistry,
    get_registry,
)

__all__ = [
    "EmbeddingFunction",
    "TextEmbeddingFunction",
    "EmbeddingDefinition",
    "EmbeddingFunctionRegistry",
    "get_registry",
]
