"""lancedb_tpu — a TPU-native embedded vector database.

A from-scratch re-design of the LanceDB capability surface
(github.com/lancedb/lancedb) for TPU hardware: versioned columnar
tables on object storage, vector indexes whose training and search run
as JAX/XLA/Pallas programs on the MXU, BM25 full-text search, SQL
filtering, hybrid search + reranking, embeddings registry, and an
elastic streaming dataloader. See SURVEY.md for the architecture map.

Quick start::

    import lancedb_tpu as ldb

    db = ldb.connect("/tmp/mydb")
    tbl = db.create_table("items", [{"id": 1, "vector": [0.1, 0.2]}])
    tbl.create_index(index_type="IVF_PQ", metric="l2")
    tbl.search([0.1, 0.2]).limit(5).where("id > 0").to_arrow()
"""

def _enable_jax_compilation_cache() -> None:
    """Persistent XLA compilation cache (opt out: LANCEDB_TPU_JAX_CACHE=off).

    TPU compiles of the search/build programs take tens of seconds; the
    cache makes every process after the first start hot. Only set when
    the user hasn't configured one already.
    """
    import os

    loc = os.environ.get("LANCEDB_TPU_JAX_CACHE")
    if loc == "off":
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            path = loc or os.path.expanduser("~/.cache/lancedb_tpu/jax-cache")
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - never block import on cache setup
        pass


_enable_jax_compilation_cache()

from .arrow import vector
from .blob import blob_field
from .context import contextualize
from .db import (
    AsyncConnection,
    DBConnection,
    LanceDBConnection,
    connect,
    connect_async,
    deserialize_conn,
)
from .errors import LanceDBError
from .namespace import LanceNamespaceConnection, connect_namespace
from .namespace_rest import NamespaceServer, RestNamespace, connect_namespace_client
from .session import Session
from .query import (
    DEFAULT_TOP_K,
    LanceEmptyQueryBuilder,
    LanceFtsQueryBuilder,
    LanceHybridQueryBuilder,
    LanceQueryBuilder,
    LanceVectorQueryBuilder,
)
from .query_fts import (
    BooleanQuery,
    BoostQuery,
    FullTextQueryType,
    MatchQuery,
    MultiMatchQuery,
    Occur,
    Operator,
    PhraseQuery,
)
from .sql_spill import set_sql_memory_budget, sql_memory_budget
from .table import AsyncTable, MergeInsertBuilder, Table

__version__ = "0.1.0"

__all__ = [
    "set_sql_memory_budget",
    "sql_memory_budget",
    "deserialize_conn",
    "connect",
    "connect_async",
    "connect_namespace",
    "connect_namespace_client",
    "NamespaceServer",
    "RestNamespace",
    "LanceNamespaceConnection",
    "Session",
    "blob_field",
    "contextualize",
    "vector",
    "DBConnection",
    "LanceDBConnection",
    "AsyncConnection",
    "Table",
    "AsyncTable",
    "MergeInsertBuilder",
    "LanceQueryBuilder",
    "LanceVectorQueryBuilder",
    "LanceFtsQueryBuilder",
    "LanceHybridQueryBuilder",
    "LanceEmptyQueryBuilder",
    "FullTextQueryType",
    "MatchQuery",
    "PhraseQuery",
    "BoostQuery",
    "MultiMatchQuery",
    "BooleanQuery",
    "Occur",
    "Operator",
    "LanceDBError",
    "DEFAULT_TOP_K",
    "__version__",
]
