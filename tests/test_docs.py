"""Docs-drift tests (reference runs docs snippets under tests/docs/):
every python block in docs/guide.md must at least compile, and every
``db.<x>`` / ``tbl.<x>`` method the guide names must exist on the real
classes — so the guide cannot silently rot as the API moves."""

import re
from pathlib import Path

import pytest

GUIDE = Path(__file__).resolve().parent.parent / "docs" / "guide.md"


def _python_blocks() -> list[tuple[int, str]]:
    text = GUIDE.read_text()
    out = []
    for m in re.finditer(r"```python\n(.*?)```", text, re.DOTALL):
        line = text[: m.start()].count("\n") + 2
        out.append((line, m.group(1)))
    return out


def test_guide_exists_and_has_snippets():
    blocks = _python_blocks()
    assert len(blocks) >= 10


@pytest.mark.parametrize("line,block", _python_blocks(), ids=lambda v: str(v))
def test_guide_snippets_compile(line, block):
    try:
        compile(block, f"guide.md:{line}", "exec")
    except SyntaxError as e:  # pragma: no cover - failure path
        pytest.fail(f"guide.md snippet at line {line} does not compile: {e}")


def test_guide_method_names_exist(mem_db):
    """Every `db.x(` / `tbl.x(` / `tbl.x.` call named in the guide must
    be a real attribute of the live objects."""
    import numpy as np
    import pyarrow as pa

    from lancedb_tpu.query import LanceQueryBuilder  # noqa: F401 (import check)

    n = 8
    tbl = mem_db.create_table(
        "docs_t",
        pa.table({
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "vector": pa.FixedSizeListArray.from_arrays(
                pa.array(np.zeros(n * 4, dtype=np.float32)), 4
            ),
        }),
    )
    text = GUIDE.read_text()
    db_attrs = set(re.findall(r"\bdb\.([a-z_][a-z0-9_]*)\s*\(", text))
    tbl_attrs = set(re.findall(r"\btbl\.([a-z_][a-z0-9_]*)\s*[\(.]", text))
    missing = [f"db.{a}" for a in sorted(db_attrs) if not hasattr(mem_db, a)]
    missing += [f"tbl.{a}" for a in sorted(tbl_attrs) if not hasattr(tbl, a)]
    assert not missing, f"guide.md names methods that do not exist: {missing}"


def test_guide_search_builder_methods_exist(mem_db):
    """Chained query-builder methods named in the guide exist on the
    builders the search() entry points actually return."""
    import numpy as np
    import pyarrow as pa

    n = 8
    tbl = mem_db.create_table(
        "docs_q",
        pa.table({
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([f"word{i}" for i in range(n)]),
            "vector": pa.FixedSizeListArray.from_arrays(
                pa.array(np.zeros(n * 4, dtype=np.float32)), 4
            ),
        }),
    )
    text = GUIDE.read_text()
    # methods chained directly after `.search(...)` blocks: grab
    # `.name(` tokens inside parenthesized builder chains that start
    # with tbl.search
    builder = tbl.search(np.zeros(4, dtype=np.float32))
    chain_attrs = set()
    for m in re.finditer(r"tbl\.search\([^)]*\)((?:\s*\.[a-z_][a-z0-9_]*\([^()]*\))+)", text):
        chain_attrs.update(re.findall(r"\.([a-z_][a-z0-9_]*)\(", m.group(1)))
    missing = [a for a in sorted(chain_attrs) if not hasattr(builder, a)]
    assert not missing, f"guide.md vector-builder methods missing: {missing}"
