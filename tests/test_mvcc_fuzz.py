"""Model-based MVCC fuzz (scripts/fuzz_mvcc.py): random mutation
sequences vs a python oracle, with time-travel replay of every
recorded version (reference MVCC semantics: table.rs versions/restore,
optimize.rs prune)."""

import sys

import pytest

sys.path.insert(0, "scripts")

from fuzz_mvcc import fuzz  # noqa: E402


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mvcc_random_ops_match_oracle(seed):
    failures = fuzz(80, seed)
    assert not failures, failures[:5]
