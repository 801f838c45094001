"""Device mesh utilities.

The reference scales queries via server-side distributed execution and
coordinates writers through object storage (SURVEY.md §2.6-2.7). The
TPU equivalent: a `jax.sharding.Mesh` over the slice, data sharded by
rows/partitions, XLA collectives for the top-k merge. These helpers
centralize mesh construction so tests (8 virtual CPU devices), the
single-chip bench, and real multi-chip slices share one code path.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"  # database rows / IVF partitions
QUERY_AXIS = "query"  # query batch


def make_mesh(num_devices: int | None = None, query_parallel: int = 1) -> Mesh:
    """Build a (query, shard) mesh over available devices."""
    devs = jax.devices()
    n = num_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    if n % query_parallel != 0:
        raise ValueError("query_parallel must divide device count")
    grid = np.array(devs[:n]).reshape(query_parallel, n // query_parallel)
    return Mesh(grid, (QUERY_AXIS, SHARD_AXIS))


def shard_rows(mesh: Mesh, arr, axis: int = 0):
    """Place an array sharded along `axis` over the shard axis."""
    spec = [None] * arr.ndim
    spec[axis] = SHARD_AXIS
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0, value=0):
    size = arr.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return arr, size
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, target - size)
    return np.pad(arr, widths, constant_values=value), size
