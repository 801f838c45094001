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
