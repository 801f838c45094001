"""Permutation + elastic streaming dataloader tests.

The topology sweep mirrors the reference's test_elastic_dataloader.py:
determinism and resumability are verified for many (world_size, workers)
combinations in ONE process by passing explicit rank/world_size and a
fake worker-info (reference test_elastic_dataloader.py:20-77)."""

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pytest

from lancedb_tpu.data import StreamingDataset, permutation_builder
from lancedb_tpu.errors import InvalidInputError


@dataclass
class FakeWorkerInfo:
    id: int
    num_workers: int


@pytest.fixture
def base_table(mem_db):
    n = 240
    tbl = pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "value": pa.array(np.arange(n, dtype=np.float64) * 1.5),
            "group": pa.array([f"g{i % 4}" for i in range(n)]),
        }
    )
    return mem_db.create_table("base", tbl)


class TestPermutation:
    def test_random_split_fractions(self, base_table):
        perm = (
            permutation_builder(base_table)
            .split_random(seed=1, fractions=[0.75, 0.25])
            .execute()
        )
        assert perm.num_splits == 2
        assert perm.split_size(0) == 180
        assert perm.split_size(1) == 60
        # disjoint + complete
        a = set(perm.read(0, 0, 180).column("id").to_pylist())
        b = set(perm.read(1, 0, 60).column("id").to_pylist())
        assert not (a & b)
        assert len(a | b) == 240

    def test_random_split_deterministic(self, base_table):
        p1 = permutation_builder(base_table).split_random(seed=7, counts=[50, 50]).execute()
        p2 = permutation_builder(base_table).split_random(seed=7, counts=[50, 50]).execute()
        assert p1.read(0, 0, 50).column("id").to_pylist() == p2.read(0, 0, 50).column("id").to_pylist()

    def test_hash_split_stable(self, base_table):
        perm = permutation_builder(base_table).split_hash(["id"], [1, 1]).execute()
        perm2 = permutation_builder(base_table).split_hash(["id"], [1, 1]).execute()
        assert perm.split_size(0) == perm2.split_size(0)
        # same id always lands in the same split
        s0 = set(perm.read(0, 0, perm.split_size(0)).column("id").to_pylist())
        s0b = set(perm2.read(0, 0, perm2.split_size(0)).column("id").to_pylist())
        assert s0 == s0b

    def test_hash_split_discard(self, base_table):
        perm = permutation_builder(base_table).split_hash(["id"], [1, 1], discard_weight=2).execute()
        assert len(perm) < 240

    def test_sequential_split(self, base_table):
        perm = permutation_builder(base_table).split_sequential(sizes=[100, 140]).execute()
        assert perm.read(0, 0, 3).column("id").to_pylist() == [0, 1, 2]
        assert perm.read(1, 0, 3).column("id").to_pylist() == [100, 101, 102]

    def test_calculated_split(self, base_table):
        perm = permutation_builder(base_table).split_calculated("id % 3").execute()
        assert perm.num_splits == 3
        ids = perm.read(1, 0, perm.split_size(1)).column("id").to_pylist()
        assert all(i % 3 == 1 for i in ids)

    def test_filter(self, base_table):
        perm = permutation_builder(base_table).filter("id < 100").execute()
        assert len(perm) == 100

    def test_shuffle(self, base_table):
        plain = permutation_builder(base_table).execute()
        shuffled = permutation_builder(base_table).shuffle(seed=3).execute()
        assert plain.read(0, 0, 240).column("id").to_pylist() != shuffled.read(0, 0, 240).column(
            "id"
        ).to_pylist()
        assert sorted(shuffled.read(0, 0, 240).column("id").to_pylist()) == list(range(240))

    def test_named_dest(self, base_table, mem_db):
        permutation_builder(base_table, dest="my_perm").execute()
        assert "my_perm" in mem_db.table_names()


def collect(ds):
    return [row["id"] for row in ds]


class TestStreamingDataset:
    def test_full_epoch_single_rank(self, base_table):
        perm = permutation_builder(base_table).shuffle(seed=1).execute()
        ds = StreamingDataset(perm, num_splits=12, read_batch_size=7)
        ids = collect(ds)
        assert sorted(ids) == list(range(240))

    def test_topology_independence(self, base_table):
        """Union of samples over all ranks is the full dataset for every
        topology, and per-rank streams are deterministic."""
        perm = permutation_builder(base_table).shuffle(seed=5).execute()
        for world in (1, 2, 3, 4, 6, 12):
            seen = []
            for rank in range(world):
                ds = StreamingDataset(perm, num_splits=12, rank=rank, world_size=world)
                seen.extend(collect(ds))
            assert sorted(seen) == list(range(240)), f"world={world}"

    def test_workers_subdivide(self, base_table):
        perm = permutation_builder(base_table).execute()
        all_ids = []
        for wid in range(2):
            ds = StreamingDataset(
                perm, num_splits=12, rank=0, world_size=2,
                worker_info=FakeWorkerInfo(id=wid, num_workers=2),
            )
            all_ids.extend(collect(ds))
        solo = StreamingDataset(perm, num_splits=12, rank=0, world_size=2)
        assert sorted(all_ids) == sorted(collect(solo))

    def test_resume_mid_epoch(self, base_table):
        perm = permutation_builder(base_table).shuffle(seed=9).execute()
        full = collect(StreamingDataset(perm, num_splits=6, read_batch_size=5))
        ds = StreamingDataset(perm, num_splits=6, read_batch_size=5)
        it = iter(ds)
        first = [next(it)["id"] for _ in range(100)]
        state = ds.state_dict()
        del it
        resumed = StreamingDataset(perm, num_splits=6, read_batch_size=5)
        resumed.load_state_dict(state)
        rest = collect(resumed)
        assert sorted(first + rest) == list(range(240))
        assert first + rest == full  # exact continuation, same order

    def test_resume_across_topology(self, base_table):
        """The killer feature: state from a 2-rank run resumes on 3 ranks
        (reference streaming.py topology-independent checkpoints)."""
        perm = permutation_builder(base_table).shuffle(seed=2).execute()
        NS = 12
        # run 2 ranks partially
        states = []
        consumed_ids = []
        for rank in range(2):
            ds = StreamingDataset(perm, num_splits=NS, rank=rank, world_size=2)
            it = iter(ds)
            consumed_ids.extend(next(it)["id"] for _ in range(45))
            states.append(np.asarray(ds.state_dict()["consumed"]))
            del it
        merged = np.maximum.reduce(states)  # disjoint splits → elementwise max merges
        # resume on 3 ranks
        rest = []
        for rank in range(3):
            ds = StreamingDataset(perm, num_splits=NS, rank=rank, world_size=3)
            ds.load_state_dict({"consumed": merged.tolist(), "num_splits": NS, "total_rows": 240})
            rest.extend(collect(ds))
        assert sorted(consumed_ids + rest) == list(range(240))

    def test_round_robin_interleaves_splits(self, base_table):
        perm = permutation_builder(base_table).execute()  # sequential order
        ds = StreamingDataset(perm, num_splits=4, read_batch_size=10)
        first8 = [r["id"] for _, r in zip(range(8), iter(ds))]
        # one sample from each split per pass: ids come from 4 different blocks
        blocks = {i // 60 for i in first8[:4]}
        assert len(blocks) == 4

    def test_validation_errors(self, base_table):
        perm = permutation_builder(base_table).execute()
        with pytest.raises(InvalidInputError):
            StreamingDataset(perm, num_splits=7, world_size=2)  # not divisible
        with pytest.raises(InvalidInputError):
            StreamingDataset(perm, num_splits=4, rank=9, world_size=2)

    def test_columns_and_transform(self, base_table):
        perm = permutation_builder(base_table).execute()
        ds = StreamingDataset(
            perm,
            num_splits=4,
            columns=["value"],
            transform=lambda t: list(t.column("value").to_numpy() * 2),
        )
        vals = list(ds)
        assert len(vals) == 240
        assert isinstance(vals[0], float)

    def test_instrumentation(self, base_table):
        perm = permutation_builder(base_table).execute()
        ds = StreamingDataset(perm, num_splits=4)
        collect(ds)
        assert ds.bytes_loaded > 0
        assert ds.fetch_time > 0
        assert ds.average_fetch_time > 0

    def test_split_selection(self, base_table):
        perm = (
            permutation_builder(base_table)
            .split_random(seed=1, fractions=[0.5, 0.5])
            .execute()
        )
        ds = StreamingDataset(perm, split=1, num_splits=4)
        assert len(collect(ds)) == 120


class TestTorchIntegration:
    def test_torch_dataloader(self, base_table):
        """StreamingDataset is a torch IterableDataset (reference
        test_torch.py territory)."""
        torch = pytest.importorskip("torch")
        from torch.utils.data import DataLoader

        perm = permutation_builder(base_table).shuffle(seed=4).execute()
        ds = StreamingDataset(
            perm, num_splits=4, columns=["id", "value"],
            transform=lambda t: [
                {k: torch.tensor(v) for k, v in row.items()} for row in t.to_pylist()
            ],
        )
        loader = DataLoader(ds, batch_size=16, num_workers=0)
        batches = list(loader)
        total = sum(b["id"].shape[0] for b in batches)
        assert total == 240
        assert batches[0]["id"].dtype == torch.int64

    def test_torch_workers_split(self, base_table):
        torch = pytest.importorskip("torch")
        from torch.utils.data import DataLoader

        perm = permutation_builder(base_table).execute()

        def make(worker_id, num_workers):
            return StreamingDataset(
                perm, num_splits=12, rank=0, world_size=1,
                worker_info=FakeWorkerInfo(id=worker_id, num_workers=num_workers),
            )

        ids = []
        for w in range(3):
            ids.extend(r["id"] for r in make(w, 3))
        assert sorted(ids) == list(range(240))


class TestJaxFeed:
    """StreamingDataset -> sharded jax.Array batches
    (data/jax_feed.py): global batches sharded over the mesh, static
    shapes, checkpoint pass-through, multi-rank consistency."""

    def _vec_table(self, mem_db, n=256, d=8):
        rng = np.random.default_rng(0)
        tbl = pa.table({
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "vector": pa.FixedSizeListArray.from_arrays(
                pa.array(rng.standard_normal(n * d).astype(np.float32)), d),
            "label": pa.array((np.arange(n) % 5).astype(np.int64)),
        })
        return mem_db.create_table("feedsrc", tbl)

    def test_sharded_batches(self, mem_db):
        import jax
        from lancedb_tpu.data import JaxBatchFeeder

        t = self._vec_table(mem_db)
        perm = permutation_builder(t).shuffle(seed=1).execute()
        ds = StreamingDataset(perm, num_splits=8)
        feeder = JaxBatchFeeder(ds, batch_size=64, columns=["vector", "label"])
        batches = list(feeder)
        assert len(batches) == 256 // 64 == len(feeder)
        b = batches[0]
        assert b["vector"].shape == (64, 8) and b["label"].shape == (64,)
        assert isinstance(b["vector"], jax.Array)
        # batch axis is sharded over the mesh
        assert len(b["vector"].sharding.device_set) == len(jax.devices())
        # every row appears exactly once across all batches
        seen = np.concatenate([np.asarray(b["label"]) for b in batches])
        assert len(seen) == 256

    def test_feeds_a_jit_step(self, mem_db):
        import jax
        import jax.numpy as jnp
        from lancedb_tpu.data import JaxBatchFeeder

        t = self._vec_table(mem_db)
        perm = permutation_builder(t).shuffle(seed=2).execute()
        feeder = JaxBatchFeeder(
            StreamingDataset(perm, num_splits=8), batch_size=32,
            columns=["vector"],
        )

        @jax.jit
        def step(w, x):
            return w - 0.1 * jnp.mean(x @ w)

        w = jnp.ones((8,))
        shapes = set()
        for batch in feeder:
            shapes.add(batch["vector"].shape)
            w = step(w, batch["vector"])
        assert shapes == {(32, 8)}  # static: one compile
        assert np.isfinite(np.asarray(w)).all()

    def test_state_dict_resume(self, mem_db):
        from lancedb_tpu.data import JaxBatchFeeder

        t = self._vec_table(mem_db)
        perm = permutation_builder(t).shuffle(seed=3).execute()

        def collect(feeder, n=None):
            out = []
            for i, b in enumerate(feeder):
                out.append(np.asarray(b["label"]))
                if n is not None and i + 1 == n:
                    break
            return out

        ds = StreamingDataset(perm, num_splits=8)
        f1 = JaxBatchFeeder(ds, batch_size=32, columns=["label"], prefetch=1)
        first_two = collect(f1, n=2)
        state = f1.state_dict()
        # fresh dataset resumed from the checkpoint sees the REST
        ds2 = StreamingDataset(perm, num_splits=8)
        f2 = JaxBatchFeeder(ds2, batch_size=32, columns=["label"], prefetch=1)
        f2.load_state_dict(state)
        rest = collect(f2)
        total = sum(len(x) for x in first_two) + sum(len(x) for x in rest)
        # prefetch may have consumed a few extra rows before the
        # checkpoint cut — everything else must arrive exactly once.
        # the producer can be ahead by the queue (1) + the batch being
        # built (1) + one more under scheduler contention → 3 batches
        assert total <= 256
        assert total >= 256 - 32 * 3

    def test_bad_batch_size_rejected(self, mem_db):
        from lancedb_tpu.data import JaxBatchFeeder

        t = self._vec_table(mem_db)
        perm = permutation_builder(t).execute()
        ds = StreamingDataset(perm, num_splits=8)
        # 7 does not shard evenly over the 8-device mesh
        with pytest.raises(InvalidInputError, match="shard|divide"):
            JaxBatchFeeder(ds, batch_size=7, columns=["id"])


class TestJaxFeedEdgeCases:
    """Post-review: early break releases the producer; integer nested
    columns keep their dtype."""

    def test_early_break_no_leak(self, mem_db):
        import threading

        from lancedb_tpu.data import JaxBatchFeeder

        n = 128
        tbl = pa.table({
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "vector": pa.FixedSizeListArray.from_arrays(
                pa.array(np.zeros(n * 4, dtype=np.float32)), 4),
        })
        t = mem_db.create_table("leaksrc", tbl)
        perm = permutation_builder(t).execute()
        feeder = JaxBatchFeeder(
            StreamingDataset(perm, num_splits=8), batch_size=16, columns=["vector"])
        for b in feeder:
            break  # abandon mid-stream
        # the named producer thread must exit promptly (unrelated
        # background threads from other tests don't affect this)
        import time as _t
        deadline = _t.time() + 5
        while _t.time() < deadline:
            if not any(
                th.name == "lancedb-jax-feed" and th.is_alive()
                for th in threading.enumerate()
            ):
                break
            _t.sleep(0.05)
        assert not any(
            th.name == "lancedb-jax-feed" and th.is_alive()
            for th in threading.enumerate()
        )

    def test_integer_columns_keep_dtype(self, mem_db):
        from lancedb_tpu.data import JaxBatchFeeder

        big = 1 << 25  # would corrupt in float32
        tbl = pa.table({
            "ids": pa.array([[big + i, i] for i in range(64)], type=pa.list_(pa.int64())),
        })
        t = mem_db.create_table("intsrc", tbl)
        perm = permutation_builder(t).execute()
        feeder = JaxBatchFeeder(
            StreamingDataset(perm, num_splits=8), batch_size=16, columns=["ids"])
        b = next(iter(feeder))
        arr = np.asarray(b["ids"])
        assert np.issubdtype(arr.dtype, np.integer)
        assert arr.max() >= big


class TestNamedSplits:
    """split_names + the Permutations collection (reference
    permutation.py:238, tests test_no_split_names/test_permutations)."""

    def test_named_splits_roundtrip(self, mem_db):
        import numpy as np

        from lancedb_tpu.data import Permutations, permutation_builder

        t = mem_db.create_table("nsp", {
            "id": np.arange(100), "cat": np.arange(100) % 4,
        }, mode="overwrite")
        perm = permutation_builder(t).split_random(
            seed=1, fractions=[0.8, 0.2], split_names=["train", "val"],
        ).execute()
        ps = Permutations.from_tables(t, perm.perm_table)
        assert ps.split_names == ["train", "val"]
        assert ps["train"].num_rows == 80
        assert ps["val"].num_rows == 20
        assert ps[1].name == "val"
        assert ps["train"].shape == (80, 2)
        assert ps["val"].read(0, 3).num_rows == 3
        assert {s.name for s in ps} == {"train", "val"}

    def test_unnamed_fallback_and_validation(self, mem_db):
        import numpy as np
        import pytest as _pytest

        from lancedb_tpu.data import Permutations, permutation_builder
        from lancedb_tpu.errors import InvalidInputError

        t = mem_db.create_table("nsp2", {"id": np.arange(20)}, mode="overwrite")
        perm = permutation_builder(t).split_random(fractions=[0.5, 0.5]).execute()
        ps = Permutations(t, perm.perm_table)
        assert ps.split_names == ["split_0", "split_1"]
        with _pytest.raises(InvalidInputError):
            ps["train"]
        with _pytest.raises(InvalidInputError):
            permutation_builder(t).split_random(
                fractions=[0.5, 0.5], split_names=["a", "a"])
        with _pytest.raises(InvalidInputError):
            permutation_builder(t).split_sequential([10, 10], split_names=["x"])
