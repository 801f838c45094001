from .mesh import QUERY_AXIS, SHARD_AXIS, make_mesh, replicate, shard_rows
from .search import (
    ShardedFlatIndex,
    make_distributed_kmeans_step,
    make_sharded_flat_search,
    make_sharded_ivf_search,
)

__all__ = [
    "make_mesh",
    "shard_rows",
    "replicate",
    "SHARD_AXIS",
    "QUERY_AXIS",
    "ShardedFlatIndex",
    "make_sharded_flat_search",
    "make_sharded_ivf_search",
    "make_distributed_kmeans_step",
]

from .build import ShardedIvfPqIndex, distributed_kmeans  # noqa: E402

__all__ += ["ShardedIvfPqIndex", "distributed_kmeans"]
