"""Regression tests for the round-3 advisor findings (ADVICE.md r3).

1. Permutation/StreamingDataset pickling preserves the base table's
   FRAGMENT layout (row addresses are fragment_id<<32|offset; the old
   to_arrow()+create_table round trip collapsed fragments — unpickle
   crashed on multi-fragment tables and silently shifted rows after
   deletes).
2. Hardcoded API keys never persist into table metadata, even for
   directly-instantiated embedding functions.
3. StreamingDataset honors (or rejects) a dataset-view Permutation's
   selection/window/split state instead of silently dropping it.
4. with_format('polars') views stay picklable.
5. Split accessors resolve non-contiguous split ids.
"""

import pickle

import numpy as np
import pyarrow as pa
import pytest

import lancedb_tpu
from lancedb_tpu.data import Permutation, StreamingDataset, permutation_builder


def _col_of(view, col):
    """Materialize one column of a Permutation view row by row
    (Permutation.__iter__ yields batches and skips the last partial
    batch, so list(view) on small views is empty by contract)."""
    return [view[i][0][col] for i in range(len(view))]


def _two_fragment_table(db, with_deletes: bool):
    n1, n2 = 12, 8
    t = db.create_table(
        "base",
        pa.table({
            "id": pa.array(np.arange(n1, dtype=np.int64)),
            "val": pa.array([f"f0-{i}" for i in range(n1)]),
        }),
    )
    t.add(pa.table({
        "id": pa.array(np.arange(100, 100 + n2, dtype=np.int64)),
        "val": pa.array([f"f1-{i}" for i in range(n2)]),
    }))
    assert len(t.to_lance().manifest.fragments) == 2
    if with_deletes:
        t.delete("id IN (3, 5, 101)")
    return t


@pytest.mark.parametrize("with_deletes", [False, True])
def test_permutation_pickle_multi_fragment_memory_table(with_deletes):
    db = lancedb_tpu.connect("memory://advice-r3-perm")
    t = _two_fragment_table(db, with_deletes)
    view = Permutation.identity(t)
    want = _col_of(view, "id")
    assert len(want) == (20 - 3 if with_deletes else 20)

    clone = pickle.loads(pickle.dumps(view))
    got = _col_of(clone, "id")
    assert got == want
    # fragment layout preserved bit-for-bit
    src = t.to_lance().manifest
    dst = clone.base_table.to_lance().manifest
    assert [f.id for f in src.fragments] == [f.id for f in dst.fragments]
    assert [f.physical_rows for f in src.fragments] == [
        f.physical_rows for f in dst.fragments
    ]
    assert [f.num_deleted for f in src.fragments] == [
        f.num_deleted for f in dst.fragments
    ]
    db.drop_table("base")


def test_permutation_pickle_shuffled_split_view():
    db = lancedb_tpu.connect("memory://advice-r3-perm2")
    t = _two_fragment_table(db, with_deletes=True)
    perm = permutation_builder(t).split_random(seed=7).shuffle(seed=7).execute()
    view = Permutation.from_tables(t, perm.perm_table, None)
    want = _col_of(view, "val")
    assert len(want) > 0
    got = _col_of(pickle.loads(pickle.dumps(view)), "val")
    assert got == want
    db.drop_table("base")


def test_streaming_dataset_pickle_multi_fragment():
    db = lancedb_tpu.connect("memory://advice-r3-sds")
    t = _two_fragment_table(db, with_deletes=True)
    perm = permutation_builder(t).split_random(seed=3).shuffle(seed=3).execute()
    ds = StreamingDataset(perm, num_splits=4, read_batch_size=4)
    want = [s["id"] for _, s in zip(range(12), iter(ds))]

    ds2 = pickle.loads(pickle.dumps(StreamingDataset(
        permutation_builder(t).split_random(seed=3).shuffle(seed=3).execute(),
        num_splits=4, read_batch_size=4,
    )))
    got = [s["id"] for _, s in zip(range(12), iter(ds2))]
    assert got == want
    db.drop_table("base")


# ------------------------------------------------- 2. secret persistence
def test_hardcoded_secret_never_persists_via_source_field():
    """ADVICE r3 high #2: OpenAI(api_key='sk-...') instantiated directly
    and wired through SourceField/VectorField must NOT leak the key into
    table schema metadata — persistence refuses hardcoded secrets."""
    pytest.importorskip("pydantic")
    from lancedb_tpu.embeddings.rest_providers import OpenAIEmbedding
    from lancedb_tpu.errors import InvalidInputError
    from lancedb_tpu.pydantic import LanceModel, Vector

    fn = OpenAIEmbedding(api_key="sk-SECRET-123", ndims=8)

    class Doc(LanceModel):
        text: str = fn.SourceField()
        vector: Vector(8) = fn.VectorField()

    db = lancedb_tpu.connect("memory://advice-r3-secret")
    with pytest.raises(InvalidInputError, match="sensitive"):
        db.create_table("docs", schema=Doc)
    assert "docs" not in db.table_names()


def test_var_reference_secret_persists_as_reference():
    pytest.importorskip("pydantic")
    from lancedb_tpu.embeddings.rest_providers import OpenAIEmbedding

    fn = OpenAIEmbedding(api_key="$var:my_key", ndims=8)
    dumped = fn.safe_model_dump()
    assert dumped["api_key"] == "$var:my_key"


def test_safe_model_dump_rejects_hardcoded_secret():
    from lancedb_tpu.embeddings.rest_providers import OpenAIEmbedding
    from lancedb_tpu.errors import InvalidInputError

    fn = OpenAIEmbedding(api_key="sk-SECRET-123", ndims=8)
    with pytest.raises(InvalidInputError, match="sensitive"):
        fn.safe_model_dump()


# --------------------------------------- 3. view state honored by streaming
def test_streaming_honors_view_selection_and_window():
    db = lancedb_tpu.connect("memory://advice-r3-view")
    t = db.create_table("base", pa.table({
        "id": pa.array(np.arange(12, dtype=np.int64)),
        "val": pa.array([f"v{i}" for i in range(12)]),
    }))
    view = Permutation.identity(t).select_columns(["id"]).with_take(4)
    ds = StreamingDataset(view, num_splits=1, read_batch_size=2)
    rows = list(iter(ds))
    assert len(rows) == 4
    assert all(set(r) == {"id"} for r in rows)
    assert [r["id"] for r in rows] == [0, 1, 2, 3]
    # skip+take window
    view2 = Permutation.identity(t).with_skip(3).with_take(5)
    rows2 = [r["id"] for r in iter(StreamingDataset(view2, num_splits=1))]
    assert rows2 == [3, 4, 5, 6, 7]
    db.drop_table("base")


def test_streaming_uses_view_split():
    from lancedb_tpu.data import Permutations

    db = lancedb_tpu.connect("memory://advice-r3-split")
    t = db.create_table("base", pa.table({
        "id": pa.array(np.arange(20, dtype=np.int64)),
    }))
    reader = (
        permutation_builder(t)
        .split_random(seed=5, fractions=[0.5, 0.5], split_names=["train", "val"])
        .execute()
    )
    perms = Permutations.from_tables(t, reader.perm_table)
    train = perms.get_by_name("train")
    # previously errored demanding split=<id>
    ds = StreamingDataset(train, num_splits=1)
    ids = [r["id"] for r in iter(ds)]
    assert len(ids) == len(train) > 0
    assert sorted(ids) == sorted(_col_of(train, "id"))


def test_streaming_rejects_formatted_view():
    from lancedb_tpu.errors import InvalidInputError

    db = lancedb_tpu.connect("memory://advice-r3-fmt")
    t = db.create_table("base", pa.table({"id": pa.array([1, 2, 3])}))
    view = Permutation.identity(t).with_format("numpy")
    with pytest.raises(InvalidInputError, match="format"):
        StreamingDataset(view, num_splits=1)
    db.drop_table("base")


def test_windowed_streaming_survives_pickle():
    db = lancedb_tpu.connect("memory://advice-r3-winpkl")
    t = db.create_table("base", pa.table({
        "id": pa.array(np.arange(10, dtype=np.int64)),
    }))
    view = Permutation.identity(t).with_skip(2).with_take(3)
    ds = pickle.loads(pickle.dumps(StreamingDataset(view, num_splits=1)))
    assert [r["id"] for r in iter(ds)] == [2, 3, 4]
    db.drop_table("base")


# ----------------------------------------------- 4. polars view picklable
def test_polars_format_view_is_picklable():
    db = lancedb_tpu.connect("memory://advice-r3-pl")
    t = db.create_table("base", pa.table({"id": pa.array([1, 2, 3])}))
    view = Permutation.identity(t).with_format("polars")
    clone = pickle.loads(pickle.dumps(view))  # closure would fail here
    assert clone.transform_fn is view.transform_fn
    db.drop_table("base")


# ------------------------------------- 5. non-contiguous split id ordinals
def test_sparse_split_ids_resolve_by_ordinal():
    from lancedb_tpu.data import Permutations

    db = lancedb_tpu.connect("memory://advice-r3-sparse")
    t = db.create_table("base", pa.table({
        "id": pa.array(np.arange(30, dtype=np.int64)),
    }))
    # split ids {0, 2, 4} — sparse on purpose
    reader = permutation_builder(t).split_calculated("(id % 3) * 2").execute()
    assert sorted(reader.split_ids) == [0, 2, 4]
    perms = Permutations.from_tables(t, reader.perm_table)
    v1 = perms.get_by_index(1)  # must be actual split id 2
    ids = _col_of(v1, "id")
    assert len(ids) == 10 and all(i % 3 == 1 for i in ids)
    assert len(perms[2]) == reader.split_size(4)
    db.drop_table("base")
