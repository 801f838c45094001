"""Index configuration dataclasses — the user-facing index surface.

Mirrors the reference's index config model (rust index.rs:29-102 `enum
Index`, python index.py dataclasses): one small config class per index
type, passed to ``Table.create_index(config=...)``. Defaults match the
reference (partitions≈√N, PQ subvectors=dim/16, sample_rate=256,
max_iterations=50 — index/vector.rs:61-118,286-319).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal


@dataclass
class IvfFlat:
    """IVF with full-precision in-partition scan (reference IvfFlatIndexBuilder)."""

    distance_type: str = "l2"
    num_partitions: int | None = None  # default √N at build time
    sample_rate: int = 256
    max_iterations: int = 50
    seed: int = 0
    # dtype for the one-time table upload during build: bfloat16 halves
    # host->device transfer (the assignment matmul already runs bf16);
    # float32 keeps residual/codebook training at full input precision
    build_precision: str = "bfloat16"
    # device storage dtype for the scan: float32 ranks exactly (the
    # reference's IVF_FLAT is full-precision); bfloat16 halves HBM and
    # gather traffic at ~1-2% recall@10 cost (pair with refine_factor)
    precision: str = "float32"

    index_type: str = "IVF_FLAT"


@dataclass
class IvfPq:
    """IVF + product-quantized residuals (reference IvfPqIndexBuilder)."""

    distance_type: str = "l2"
    num_partitions: int | None = None
    num_sub_vectors: int | None = None  # default dim/16
    num_bits: int = 8
    sample_rate: int = 256
    max_iterations: int = 50
    seed: int = 0
    # dtype for the one-time table upload during build: bfloat16 halves
    # host->device transfer (the assignment matmul already runs bf16);
    # float32 keeps residual/codebook training at full input precision
    build_precision: str = "bfloat16"
    # OPQ rotation (Ge et al. 2013): learn an orthonormal rotation that
    # balances variance across subvectors before codebook training —
    # recall win on anisotropic embeddings; not offered by the reference
    opq: bool = False
    opq_iters: int = 8

    index_type: str = "IVF_PQ"


@dataclass
class IvfSq:
    """IVF + int8 scalar quantization (reference IvfSqIndexBuilder)."""

    distance_type: str = "l2"
    num_partitions: int | None = None
    sample_rate: int = 256
    max_iterations: int = 50
    seed: int = 0
    # dtype for the one-time table upload during build: bfloat16 halves
    # host->device transfer (the assignment matmul already runs bf16);
    # float32 keeps residual/codebook training at full input precision
    build_precision: str = "bfloat16"

    index_type: str = "IVF_SQ"


@dataclass
class IvfRq:
    """IVF + RaBitQ-style binary residual quantization (reference IvfRq)."""

    distance_type: str = "l2"
    num_partitions: int | None = None
    num_bits: int = 1
    sample_rate: int = 256
    max_iterations: int = 50
    seed: int = 0
    # dtype for the one-time table upload during build: bfloat16 halves
    # host->device transfer (the assignment matmul already runs bf16);
    # float32 keeps residual/codebook training at full input precision
    build_precision: str = "bfloat16"

    index_type: str = "IVF_RQ"


@dataclass
class Flat:
    """Brute-force scan 'index' — device-resident exact search."""

    distance_type: str = "l2"

    index_type: str = "FLAT"


@dataclass
class HnswPq:
    """HNSW graph over PQ codes (reference IvfHnswPqIndexBuilder).

    On TPU the graph walk is host-side; kept for API parity.
    """

    distance_type: str = "l2"
    num_partitions: int | None = None
    num_sub_vectors: int | None = None
    m: int = 20
    ef_construction: int = 300

    index_type: str = "IVF_HNSW_PQ"


@dataclass
class HnswSq:
    distance_type: str = "l2"
    num_partitions: int | None = None
    m: int = 20
    ef_construction: int = 300

    index_type: str = "IVF_HNSW_SQ"


@dataclass
class HnswFlat:
    distance_type: str = "l2"
    num_partitions: int | None = None
    m: int = 20
    ef_construction: int = 300

    index_type: str = "IVF_HNSW_FLAT"


@dataclass
class BTree:
    """Sorted scalar index for range/equality predicates (reference BTree,
    4096-row blocks — index/scalar.rs:14-29)."""

    index_type: str = "BTREE"


@dataclass
class Bitmap:
    """Per-value bitmap index for low-cardinality columns."""

    index_type: str = "BITMAP"


@dataclass
class LabelList:
    """Bitmap index over list-valued label columns."""

    index_type: str = "LABEL_LIST"


@dataclass
class Fm:
    """Substring-search scalar index (reference `Fm`, index.rs:31-56):
    resolves ``col LIKE '%needle%'`` (and prefix/suffix/exact LIKEs)
    from the index alone. Backed by a suffix array over the
    concatenated column text — same capability as the reference's
    FM-index, host-side structure chosen for numpy-friendly builds."""

    index_type: str = "FM"


@dataclass
class FTS:
    """BM25 full-text index (reference FtsIndexBuilder + python index.py
    tokenizer params, index.py:111-188)."""

    with_position: bool = True
    base_tokenizer: Literal[
        "simple", "whitespace", "raw", "ngram", "unicode", "cjk",
        "icu", "jieba", "lindera",
    ] = "simple"
    language: str = "English"
    max_token_length: int | None = 40
    lower_case: bool = True
    stem: bool = True
    remove_stop_words: bool = True
    ascii_folding: bool = True
    ngram_min_length: int = 3
    ngram_max_length: int = 3
    prefix_only: bool = False
    # user dictionary for the jieba/lindera dictionary-backed CJK
    # segmenters (jieba format: 'word [freq [tag]]' per line)
    dict_path: str | None = None

    index_type: str = "FTS"


@dataclass
class Auto:
    """Pick the most useful index from the column's type and stats
    (reference ``Index::Auto``, table/create_index.rs:186-213): vector
    columns get IVF_PQ with suggested sub-vectors; numeric/temporal/
    string/boolean columns get BTREE; anything else is an error."""

    distance_type: str = "l2"

    index_type: str = "AUTO"


IndexConfig = (
    Auto | IvfFlat | IvfPq | IvfSq | IvfRq | Flat | HnswPq | HnswSq | HnswFlat
    | BTree | Bitmap | LabelList | Fm | FTS
)

VECTOR_INDEX_TYPES = {
    "IVF_FLAT",
    "IVF_PQ",
    "IVF_SQ",
    "IVF_RQ",
    "FLAT",
    "IVF_HNSW_PQ",
    "IVF_HNSW_SQ",
    "IVF_HNSW_FLAT",
}
SCALAR_INDEX_TYPES = {"BTREE", "BITMAP", "LABEL_LIST", "FM"}


def default_num_partitions(num_rows: int) -> int:
    """Reference default: √N (index/vector.rs:63-70)."""
    import math

    return max(1, round(math.sqrt(max(1, num_rows))))
