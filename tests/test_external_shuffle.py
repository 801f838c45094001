"""External-shuffle permutation builder (reference dataloader
permutation shuffle.rs:32-81: memory budget + disk spill)."""

import numpy as np
import pyarrow as pa
import pytest

from lancedb_tpu.data.shuffle import external_shuffle


def _run(n=50_000, seed=7, budget=1 << 30, clump=None, splits=1, stats=None):
    rng = np.random.default_rng(0)
    row_ids = np.arange(n, dtype=np.uint64)
    split_ids = (np.arange(n) * splits // n).astype(np.int32)
    parts = list(
        external_shuffle(row_ids, split_ids, seed, clump, budget, _stats=stats)
    )
    rids = np.concatenate([p[0] for p in parts])
    sids = np.concatenate([p[1] for p in parts])
    return rids, sids


def test_identical_across_budgets():
    """The shuffled order is a global property — any budget gives the
    same permutation; only the working set changes."""
    big, _ = _run(budget=1 << 30)
    stats = {}
    small, _ = _run(budget=64 * 1024, stats=stats)  # ~50k rows vs ~2.7k-row budget
    assert stats["spilled"] and stats["n_buckets"] >= 16
    assert np.array_equal(big, small)
    tiny, _ = _run(budget=16 * 1024)
    assert np.array_equal(big, tiny)


def test_is_a_permutation_and_shuffled():
    rids, _ = _run(n=20_000)
    assert np.array_equal(np.sort(rids), np.arange(20_000, dtype=np.uint64))
    # not identity / not sorted
    assert not np.array_equal(rids, np.arange(20_000, dtype=np.uint64))
    # uniformity smoke: mean position displacement is large
    disp = np.abs(rids.astype(np.int64) - np.arange(20_000))
    assert disp.mean() > 20_000 / 4


def test_split_major_order_with_shuffle_within():
    rids, sids = _run(n=30_000, splits=3, budget=32 * 1024)
    assert np.array_equal(sids, np.sort(sids))  # split-major
    for s in range(3):
        part = rids[sids == s]
        lo, hi = s * 10_000, (s + 1) * 10_000
        assert np.array_equal(np.sort(part), np.arange(lo, hi, dtype=np.uint64))
        assert not np.array_equal(part, np.arange(lo, hi, dtype=np.uint64))


def test_clumps_move_as_units():
    n, clump = 12_000, 8
    rids, _ = _run(n=n, clump=clump, budget=16 * 1024)
    rr = rids.reshape(-1, clump)
    # every clump stays contiguous and in order
    assert (np.diff(rr.astype(np.int64), axis=1) == 1).all()
    assert (rr[:, 0] % clump == 0).all()


def test_seeds_differ():
    a, _ = _run(seed=1)
    b, _ = _run(seed=2)
    assert not np.array_equal(a, b)


def test_permutation_builder_spills(tmp_db, monkeypatch):
    """End-to-end: dataset ~24x the shuffle budget builds fine and
    matches the in-memory result."""
    import lancedb_tpu
    from lancedb_tpu.data.permutation import permutation_builder

    n = 100_000
    tbl = tmp_db.create_table(
        "base", pa.table({"x": pa.array(np.arange(n, dtype=np.int64))})
    )
    p_small = (
        permutation_builder(tbl, dest="perm_small")
        .split_random(seed=3, fractions=[0.5, 0.5])
        .shuffle(seed=11, memory_budget_bytes=100 * 1024)
        .execute()
    )
    p_big = (
        permutation_builder(tbl, dest="perm_big")
        .split_random(seed=3, fractions=[0.5, 0.5])
        .shuffle(seed=11)
        .execute()
    )
    assert np.array_equal(p_small._row_ids, p_big._row_ids)
    assert np.array_equal(p_small._split_ids, p_big._split_ids)
    assert len(p_small) == n
