"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the reference's pattern of
testing multi-rank logic in one process — test_elastic_dataloader.py
passes explicit rank/world_size; we use XLA's host-platform device
count) so sharding logic is validated without TPU hardware. Benchmarks
run separately on the real chip via bench.py.
"""

import os

# Must be set before jax initializes its backends. Exported (not just
# jax.config) so subprocesses spawned by tests — e.g. the query-node
# script in test_misc — inherit the CPU platform instead of a
# tunnel-backed plugin platform they cannot initialize.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def tmp_db(tmp_path):
    """Connection to a temp-dir database (reference conftest.py tmp_db)."""
    import lancedb_tpu

    return lancedb_tpu.connect(str(tmp_path / "db"))


@pytest.fixture
def mem_db():
    """Connection to a fresh in-memory database (reference conftest.py mem_db)."""
    import uuid

    import lancedb_tpu

    return lancedb_tpu.connect(f"memory://{uuid.uuid4().hex}")


def make_vector_table(n: int = 256, dim: int = 16, seed: int = 0) -> pa.Table:
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    values = pa.array(vecs.ravel())
    return pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "vector": pa.FixedSizeListArray.from_arrays(values, dim),
            "price": pa.array(rng.uniform(0, 100, n).astype(np.float64)),
            "label": pa.array([f"item-{i % 7}" for i in range(n)]),
        }
    )


@pytest.fixture
def sample_table_data():
    return make_vector_table()
