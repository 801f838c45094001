"""Multivector (ColBERT-style) search: maxsim over token vectors.

Reference behavior: multivector columns are FixedSizeList-of-
FixedSizeList (reference table/query.rs:168-218 "multivector →
FSL-of-FSL"), queried with a matrix of token vectors and scored by
late interaction; the python SDK ships a colpali embedder (multi-
vector) and `rerank_multivector` hooks.

TPU design: the index is a normal IVF/FLAT index over the FLATTENED
token vectors whose row ids point at the PARENT row — so all existing
device kernels work unchanged. A query's token vectors are one batched
search (tokens are just rows of Q); candidates are aggregated host-side
with the ColBERT approximation  score(doc) = Σ_i max_j sim(q_i, d_j)
over retrieved pairs, then (optionally) exactly rescored on device with
one padded einsum.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import jax
import jax.numpy as jnp
from functools import partial

from ..errors import InvalidInputError
from ..ops.util import matmul_dtype


def is_multivector_type(t: pa.DataType) -> bool:
    return (
        (pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t))
        and pa.types.is_fixed_size_list(t.value_type)
        and pa.types.is_floating(t.value_type.value_type)
    )


def multivector_dim(t: pa.DataType) -> int:
    return t.value_type.list_size


def flatten_multivector_column(col, row_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N rows of token lists) → (all_tokens (T, D), parent_rowid (T,))."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    dim = multivector_dim(col.type)
    counts = np.asarray(
        pa.compute.list_value_length(col).to_numpy(zero_copy_only=False), dtype=np.int64
    )
    flat_fsl = col.flatten()  # (total_tokens,) of fsl
    values = flat_fsl.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    tokens = values.reshape(-1, dim)
    parents = np.repeat(row_ids, counts)
    return tokens, parents


@partial(jax.jit, static_argnames=())
def _maxsim_device(q_tokens: jax.Array, doc_tokens: jax.Array, doc_mask: jax.Array) -> jax.Array:
    """Exact late-interaction scores.

    q_tokens: (nq_tok, D) unit-normalized; doc_tokens: (ndoc, max_tok, D)
    unit-normalized (zero padding); doc_mask: (ndoc, max_tok) bool.
    Returns (ndoc,) scores = Σ_i max_j q_i · d_j.
    """
    sims = jnp.einsum(
        "qd,ntd->nqt",
        q_tokens.astype(matmul_dtype()),
        doc_tokens.astype(matmul_dtype()),
        preferred_element_type=jnp.float32,
    )
    sims = jnp.where(doc_mask[:, None, :], sims, -jnp.inf)
    per_q = jnp.max(sims, axis=2)  # (ndoc, nq_tok)
    per_q = jnp.where(jnp.isfinite(per_q), per_q, 0.0)
    return jnp.sum(per_q, axis=1)


def maxsim_rescore(
    query_tokens: np.ndarray, doc_multivectors: list[np.ndarray]
) -> np.ndarray:
    """Exact maxsim for candidate docs (device einsum over padded docs)."""
    q = np.asarray(query_tokens, dtype=np.float32)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    max_tok = max((len(d) for d in doc_multivectors), default=1)
    ndoc = len(doc_multivectors)
    dim = q.shape[1]
    padded = np.zeros((ndoc, max_tok, dim), dtype=np.float32)
    mask = np.zeros((ndoc, max_tok), dtype=bool)
    for i, d in enumerate(doc_multivectors):
        d = np.asarray(d, dtype=np.float32)
        if len(d):
            d = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-30)
            padded[i, : len(d)] = d
            mask[i, : len(d)] = True
    return np.asarray(_maxsim_device(jnp.asarray(q), jnp.asarray(padded), jnp.asarray(mask)))


def multivector_search(
    table,
    column: str,
    query_tokens: np.ndarray,
    k: int,
    searcher=None,
    overfetch: int = 10,
    nprobes: int = 20,
    allowed: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Two-stage multivector retrieval → (scores desc (k,), row_ids (k,)).

    Stage 1: every query token searches the token-level index at once
    (one device batch). Stage 2: exact maxsim rescoring of the union of
    candidate parents.
    """
    from .vector import SearchParams

    ds = table._dataset
    q = np.atleast_2d(np.asarray(query_tokens, dtype=np.float32))
    if searcher is not None:
        params = SearchParams(k=min(k * overfetch, searcher.num_slots), nprobes=nprobes)
        pen = searcher.slot_penalty(allowed, None)
        dists, rowids = searcher.search(q, params, slot_penalty=pen)
    else:
        # brute force over flattened tokens
        from .vector import brute_force_search

        mats, parents = [], []
        for _, tbl in ds.scan_fragments(columns=[column], with_row_id=True):
            toks, par = flatten_multivector_column(
                tbl.column(column), tbl.column("_rowid").to_numpy().astype(np.uint64)
            )
            mats.append(toks)
            parents.append(par)
        tokens = np.concatenate(mats)
        tokens = tokens / np.maximum(np.linalg.norm(tokens, axis=1, keepdims=True), 1e-30)
        parent_ids = np.concatenate(parents)
        if allowed is not None:
            keep = np.isin(parent_ids, allowed)
            tokens, parent_ids = tokens[keep], parent_ids[keep]
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        dists, rowids = brute_force_search(
            tokens, parent_ids, qn, min(k * overfetch, len(tokens)), "cosine"
        )
    # candidate union of parent docs
    valid = rowids != np.uint64(np.iinfo(np.uint64).max)
    cands = np.unique(rowids[valid])
    if len(cands) == 0:
        return np.empty(0, np.float32), np.empty(0, np.uint64)
    docs_tbl = ds.take_rows(cands, columns=[column])
    doc_mvs = [
        np.asarray(v, dtype=np.float32) if v is not None else np.zeros((0, q.shape[1]), np.float32)
        for v in docs_tbl.column(column).to_pylist()
    ]
    scores = maxsim_rescore(q, doc_mvs)
    order = np.argsort(-scores)[:k]
    return scores[order].astype(np.float32), cands[order]


def build_multivector_index(dataset, column: str, config, name: str | None = None):
    """Token-level vector index over a multivector column: flatten the
    tokens, point row ids at parents, reuse the standard build."""
    from ..storage.manifest import IndexMeta, new_uuid
    from .vector import _save_npy
    import json
    import time

    field = dataset.schema.field(column)
    if not is_multivector_type(field.type):
        raise InvalidInputError(f"{column!r} is not a multivector column")
    mats, parents, frag_ids = [], [], []
    for meta, tbl in dataset.scan_fragments(columns=[column], with_row_id=True):
        frag_ids.append(meta.id)
        toks, par = flatten_multivector_column(
            tbl.column(column), tbl.column("_rowid").to_numpy().astype(np.uint64)
        )
        mats.append(toks)
        parents.append(par)
    tokens = np.concatenate(mats)
    parent_ids = np.concatenate(parents)
    # normalize: multivector similarity is cosine (ColBERT convention)
    tokens = tokens / np.maximum(np.linalg.norm(tokens, axis=1, keepdims=True), 1e-30)
    uuid = new_uuid()
    prefix = dataset.index_dir(uuid)
    _save_npy(dataset.store, f"{prefix}/vectors.npy", tokens)
    _save_npy(dataset.store, f"{prefix}/row_ids.npy", parent_ids)
    meta_doc = {
        "index_type": "FLAT",
        "column": column,
        "metric": "cosine",
        "dim": tokens.shape[1],
        "num_rows": len(tokens),
        "multivector": True,
        "build_seconds": 0.0,
    }
    dataset.store.write_bytes(f"{prefix}/meta.json", json.dumps(meta_doc).encode())
    return IndexMeta(
        name=name or f"{column}_idx",
        uuid=uuid,
        columns=[column],
        index_type="FLAT",
        params=meta_doc,
        fragment_ids=frag_ids,
        num_indexed_rows=len(tokens),
        created_at=time.time(),
    )
