"""Namespace catalog tests (reference test_namespace*.py)."""

import numpy as np
import pytest

from lancedb_tpu.errors import InvalidInputError
from lancedb_tpu.namespace import connect_namespace

from conftest import make_vector_table


@pytest.fixture
def ns(tmp_path):
    return connect_namespace(str(tmp_path / "catalog"))


class TestNamespaces:
    def test_create_list_describe(self, ns):
        ns.create_namespace(["prod"])
        ns.create_namespace(["prod", "search"], properties={"owner": "team-a"})
        ns.create_namespace(["dev"])
        assert ns.list_namespaces() == ["dev", "prod"]
        assert ns.list_namespaces(["prod"]) == ["search"]
        assert ns.describe_namespace(["prod", "search"])["properties"]["owner"] == "team-a"
        assert ns.namespace_exists(["prod"])
        assert not ns.namespace_exists(["missing"])

    def test_parent_must_exist(self, ns):
        with pytest.raises(InvalidInputError):
            ns.create_namespace(["a", "b"])

    def test_duplicate(self, ns):
        ns.create_namespace(["x"])
        with pytest.raises(InvalidInputError):
            ns.create_namespace(["x"])
        ns.create_namespace(["x"], mode="exist_ok")

    def test_drop(self, ns):
        ns.create_namespace(["tmp"])
        ns.drop_namespace(["tmp"])
        assert not ns.namespace_exists(["tmp"])

    def test_drop_non_empty_requires_force(self, ns):
        ns.create_namespace(["n"])
        ns.create_table(["n", "t"], make_vector_table(5))
        with pytest.raises(InvalidInputError):
            ns.drop_namespace(["n"])
        ns.drop_namespace(["n"], force=True)
        assert not ns.namespace_exists(["n"])


class TestNamespaceTables:
    def test_table_lifecycle(self, ns):
        ns.create_namespace(["prod"])
        t = ns.create_table(["prod", "items"], make_vector_table(40))
        assert ns.list_tables(["prod"]) == ["items"]
        assert ns.table_exists(["prod", "items"])
        t2 = ns.open_table(["prod", "items"])
        assert t2.count_rows() == 40
        # search works through namespace-opened tables
        res = t2.search(np.zeros(16, np.float32)).limit(3).to_arrow()
        assert res.num_rows == 3
        ns.drop_table(["prod", "items"])
        assert ns.list_tables(["prod"]) == []

    def test_root_tables(self, ns):
        ns.create_table(["top"], make_vector_table(5))
        assert ns.list_tables() == ["top"]

    def test_missing_namespace(self, ns):
        with pytest.raises(InvalidInputError):
            ns.create_table(["ghost", "t"], make_vector_table(2))

    def test_same_name_table_and_namespace_listing(self, ns):
        ns.create_namespace(["dual"])
        ns.create_table(["dual-table"], make_vector_table(2))
        assert "dual" in ns.list_namespaces()
        assert "dual-table" in ns.list_tables()
        assert "dual-table" not in ns.list_namespaces()
        assert "dual" not in ns.list_tables()


class TestRestNamespaceProtocol:
    """REST catalog protocol client+server (reference lance-namespace
    consumed by database/namespace.rs; read_freshness.rs headers)."""

    @pytest.fixture()
    def served(self, tmp_path):
        from lancedb_tpu import NamespaceServer, connect_namespace_client

        with NamespaceServer(str(tmp_path / "db"), api_key="sekrit") as srv:
            yield connect_namespace_client(srv.address, api_key="sekrit"), srv

    def test_namespace_crud_over_rest(self, served):
        ns, _ = served
        ns.create_namespace(["prod"])
        ns.create_namespace(["prod", "search"], properties={"team": "ml"})
        assert ns.namespace_exists(["prod", "search"])
        assert ns.list_namespaces(["prod"]) == ["search"]
        assert ns.describe_namespace(["prod", "search"])["properties"] == {"team": "ml"}
        ns.drop_namespace(["prod", "search"])
        assert not ns.namespace_exists(["prod", "search"])

    def test_table_lifecycle_data_plane_direct(self, served):
        ns, _ = served
        ns.create_namespace(["prod"])
        t = ns.create_table(
            ["prod", "items"],
            [{"id": i, "vector": [float(i)] * 4} for i in range(32)],
        )
        assert t.count_rows() == 32
        assert ns.table_exists(["prod", "items"])
        assert ns.list_tables(["prod"]) == ["items"]
        # data plane: writes go straight at storage, not through the catalog
        t.add([{"id": 100, "vector": [99.0] * 4}])
        t2 = ns.open_table(["prod", "items"])
        assert t2.count_rows() == 33
        res = t2.search([99.0] * 4).limit(1).to_list()
        assert res[0]["id"] == 100
        ns.rename_table(["prod", "items"], ["prod", "items2"])
        assert ns.list_tables(["prod"]) == ["items2"]
        ns.drop_table(["prod", "items2"])
        assert not ns.table_exists(["prod", "items2"])

    def test_auth_required(self, served, tmp_path):
        from lancedb_tpu import connect_namespace_client
        from lancedb_tpu.errors import HttpError
        from lancedb_tpu.remote.client import ClientConfig, RetryConfig

        _, srv = served
        bad = connect_namespace_client(
            srv.address, api_key="wrong",
            config=ClientConfig(retry_config=RetryConfig(retries=0)),
        )
        with pytest.raises(HttpError):
            bad.list_namespaces()

    def test_min_timestamp_pierces_stale_cache(self, tmp_path):
        """A second handle's describe served from the TTL cache misses a
        write until the writer-side baseline (bumped by Table._on_write)
        raises the freshness floor — reference read_freshness.rs flow."""
        from lancedb_tpu import NamespaceServer, connect_namespace_client

        with NamespaceServer(str(tmp_path / "db"), describe_cache_ttl=3600.0) as srv:
            writer = connect_namespace_client(srv.address)
            reader = connect_namespace_client(srv.address)
            writer.create_table(["t1"], [{"id": 1, "vector": [0.0] * 4}])
            v1 = reader.describe_table(["t1"])["version"]
            wt = writer.open_table(["t1"])
            wt.add([{"id": 2, "vector": [1.0] * 4}])  # bumps writer baseline
            # reader has no baseline: still sees the cached (stale) version
            assert reader.describe_table(["t1"])["version"] == v1
            # writer's next describe carries the bumped floor -> refresh
            assert writer.describe_table(["t1"])["version"] > v1
            # reader with interval=0 demands now-fresh metadata
            strict = connect_namespace_client(srv.address, read_consistency_interval=0.0)
            assert strict.describe_table(["t1"])["version"] > v1

    def test_compute_min_timestamp_rule(self):
        from lancedb_tpu.namespace_rest import compute_min_timestamp

        assert compute_min_timestamp(None, None, 100.0) is None
        assert compute_min_timestamp(90.0, None, 100.0) == 90.0
        assert compute_min_timestamp(None, 30.0, 100.0) == 70.0
        assert compute_min_timestamp(90.0, 30.0, 100.0) == 90.0
        assert compute_min_timestamp(50.0, 30.0, 100.0) == 70.0
