"""Permutation tables: deterministic splits + shuffles over a base table.

Reference: python permutation.py:21-234 `PermutationBuilder` and the
rust dataloader/permutation/{builder,split,shuffle,reader}.rs. A
permutation is itself a table of (row_id, split_id) committed through
the normal storage layer, so it is versioned, shareable between
processes, and readable by row offset — the contract StreamingDataset
builds on.

Split strategies (reference split.rs:31-78):
  * no_split     — everything in split 0
  * random       — seeded shuffle, then fractional/count sizes
  * hash         — hash of key columns → weighted buckets (+ discard)
  * sequential   — contiguous blocks in row order
  * calculated   — SQL expression produces the split id per row
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
import numpy as np
import pyarrow as pa

from ..errors import InvalidInputError
from ..filters.eval import evaluate_expression
from ..storage.dataset import ROW_ID_COL

SPLIT_COL = "split_id"


@dataclass
class _SplitSpec:
    kind: str = "none"
    seed: int = 42
    fractions: list[float] | None = None
    counts: list[int] | None = None
    clump_size: int | None = None
    columns: list[str] | None = None
    split_weights: list[int] | None = None
    discard_weight: int = 0
    sql: str | None = None
    sizes: list[int] | None = None
    split_names: list[str] | None = None


def _check_split_names(names: list[str] | None, n_splits: int) -> None:
    if names is None:
        return
    if len(names) != n_splits:
        raise InvalidInputError(
            f"split_names has {len(names)} entries for {n_splits} splits"
        )
    if len(set(names)) != len(names):
        raise InvalidInputError("split_names must be unique")


class PermutationBuilder:
    """Fluent builder (reference permutation.py:21 `PermutationBuilder`)."""

    def __init__(self, table, dest: str | None = None):
        self._table = table
        self._dest = dest
        self._split = _SplitSpec()
        self._shuffle_seed: int | None = None
        self._shuffle_clump: int | None = None
        self._filter: str | None = None

    # ---- split strategies ----
    def split_random(
        self,
        *,
        seed: int = 42,
        fractions: list[float] | None = None,
        counts: list[int] | None = None,
        clump_size: int | None = None,
        split_names: list[str] | None = None,
    ) -> "PermutationBuilder":
        if fractions is not None and counts is not None:
            raise InvalidInputError("pass either fractions or counts, not both")
        if fractions is not None and abs(sum(fractions) - 1.0) > 1e-6:
            raise InvalidInputError("fractions must sum to 1")
        n_splits = len(fractions or counts or [1])
        _check_split_names(split_names, n_splits)
        self._split = _SplitSpec(
            kind="random", seed=seed, fractions=fractions, counts=counts,
            clump_size=clump_size, split_names=split_names,
        )
        return self

    def split_hash(
        self, columns: list[str], split_weights: list[int], discard_weight: int = 0,
        split_names: list[str] | None = None,
    ) -> "PermutationBuilder":
        _check_split_names(split_names, len(split_weights))
        self._split = _SplitSpec(
            kind="hash", columns=columns, split_weights=split_weights,
            discard_weight=discard_weight, split_names=split_names,
        )
        return self

    def split_sequential(self, sizes: list[int] | None = None,
                         split_names: list[str] | None = None) -> "PermutationBuilder":
        _check_split_names(split_names, len(sizes) if sizes else 1)
        self._split = _SplitSpec(kind="sequential", sizes=sizes, split_names=split_names)
        return self

    def split_calculated(self, sql: str,
                         split_names: list[str] | None = None) -> "PermutationBuilder":
        self._split = _SplitSpec(kind="calculated", sql=sql, split_names=split_names)
        return self

    # ---- other knobs ----
    def shuffle(
        self,
        seed: int = 42,
        clump_size: int | None = None,
        memory_budget_bytes: int = 100 << 20,
    ) -> "PermutationBuilder":
        """Seeded shuffle within each split. Runs under `memory_budget_
        bytes` (default 100 MiB — reference builder.rs:30): datasets
        bigger than the budget radix-spill to disk and the output is
        identical for every budget (data/shuffle.py)."""
        self._shuffle_seed = seed
        self._shuffle_clump = clump_size
        self._shuffle_budget = memory_budget_bytes
        return self

    def filter(self, predicate: str) -> "PermutationBuilder":
        self._filter = predicate
        return self

    # ---- execution ----
    def execute(self):
        ds = self._table._dataset
        spec = self._split
        need_cols: list[str] = []
        if spec.kind == "hash":
            need_cols = list(spec.columns or [])
        elif spec.kind == "calculated":
            from ..filters.eval import referenced_columns
            from ..filters.sql import parse_sql_expr

            need_cols = sorted(
                referenced_columns(parse_sql_expr(spec.sql)) & set(ds.schema.names)
            )
        base = ds.to_table(columns=need_cols, predicate=self._filter, with_row_id=True)
        row_ids = base.column(ROW_ID_COL).to_numpy().astype(np.uint64)
        n = len(row_ids)
        if n == 0:
            raise InvalidInputError("permutation over zero rows")

        split_ids = self._assign_splits(spec, base, row_ids)
        keep = split_ids >= 0
        row_ids, split_ids = row_ids[keep], split_ids[keep]

        # order rows by split then (optionally) shuffle within split —
        # the shuffle runs under a memory budget with disk spill
        # (reference shuffle.rs:32-81) and streams out in chunks
        order = np.argsort(split_ids, kind="stable")
        row_ids, split_ids = row_ids[order], split_ids[order]
        conn = self._table._conn
        name = self._dest or f"_perm_{self._table.name}_{abs(hash((spec.kind, spec.seed, self._shuffle_seed, self._filter))) % 10**8}"
        if name in conn.table_names():
            conn.drop_table(name)

        meta = None
        if spec.split_names:
            # persisted like the reference's permutation-table metadata
            # key, so Permutations can resolve splits by name later
            meta = {b"split_names": json.dumps(spec.split_names).encode()}

        def chunk_table(rids, sids):
            t = pa.table(
                {
                    ROW_ID_COL: pa.array(rids, type=pa.uint64()),
                    SPLIT_COL: pa.array(sids.astype(np.int32)),
                }
            )
            return t.replace_schema_metadata(meta) if meta else t

        if self._shuffle_seed is not None:
            from .shuffle import external_shuffle

            budget = getattr(self, "_shuffle_budget", 100 << 20)
            dest = None
            for rids, sids in external_shuffle(
                row_ids, split_ids, self._shuffle_seed, self._shuffle_clump, budget
            ):
                if dest is None:
                    dest = conn.create_table(name, chunk_table(rids, sids))
                else:
                    dest.add(chunk_table(rids, sids))
        else:
            dest = conn.create_table(name, chunk_table(row_ids, split_ids))
        return Permutation(dest, self._table)

    def _assign_splits(self, spec: _SplitSpec, base: pa.Table, row_ids: np.ndarray) -> np.ndarray:
        n = len(row_ids)
        if spec.kind == "none":
            return np.zeros(n, dtype=np.int64)
        if spec.kind == "random":
            rng = np.random.default_rng(spec.seed)
            clump = spec.clump_size or 1
            if clump > 1:
                nclumps = -(-n // clump)
                clump_perm = rng.permutation(nclumps)
                order = np.concatenate(
                    [np.arange(c * clump, min((c + 1) * clump, n)) for c in clump_perm]
                )
            else:
                order = rng.permutation(n)
            if spec.counts is not None:
                sizes = list(spec.counts)
                if sum(sizes) > n:
                    raise InvalidInputError(f"split counts {sizes} exceed {n} rows")
            elif spec.fractions is not None:
                sizes = [int(f * n) for f in spec.fractions]
                sizes[-1] = n - sum(sizes[:-1])
            else:
                sizes = [n]
            out = np.full(n, -1, dtype=np.int64)
            start = 0
            for s, size in enumerate(sizes):
                out[order[start : start + size]] = s
                start += size
            return out
        if spec.kind == "hash":
            weights = np.asarray(spec.split_weights, dtype=np.int64)
            total = int(weights.sum()) + spec.discard_weight
            bounds = np.cumsum(weights)
            cols = [base.column(c).to_pylist() for c in spec.columns]
            out = np.empty(n, dtype=np.int64)
            for i in range(n):
                key = "\x1f".join(str(col[i]) for col in cols)
                h = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "little")
                bucket = h % total
                s = int(np.searchsorted(bounds, bucket, side="right"))
                out[i] = s if s < len(weights) else -1  # discard region
            return out
        if spec.kind == "sequential":
            if spec.sizes is None:
                return np.zeros(n, dtype=np.int64)
            out = np.full(n, -1, dtype=np.int64)
            start = 0
            for s, size in enumerate(spec.sizes):
                out[start : start + size] = s
                start += size
            return out
        if spec.kind == "calculated":
            arr = evaluate_expression(base, spec.sql)
            return np.asarray(arr.to_numpy(zero_copy_only=False), dtype=np.int64)
        raise InvalidInputError(f"unknown split strategy {spec.kind!r}")


class Permutation:
    """A materialized permutation + its base table (reference
    permutation.py `Permutation` / rust reader.rs `PermutationReader`)."""

    def __init__(self, perm_table, base_table):
        self.perm_table = perm_table
        self.base_table = base_table
        tbl = perm_table.to_arrow()
        self._row_ids = tbl.column(ROW_ID_COL).to_numpy().astype(np.uint64)
        self._split_ids = tbl.column(SPLIT_COL).to_numpy()
        self._split_offsets: dict[int, np.ndarray] = {}
        for s in np.unique(self._split_ids):
            self._split_offsets[int(s)] = np.nonzero(self._split_ids == s)[0]

    @property
    def num_splits(self) -> int:
        return len(self._split_offsets)

    def split_size(self, split: int) -> int:
        return len(self._split_offsets.get(split, ()))

    def __len__(self) -> int:
        return len(self._row_ids)

    def read(
        self, split: int, offset: int, num_rows: int, columns: list[str] | None = None
    ) -> pa.Table:
        """Rows [offset, offset+num_rows) of one split, in permuted order
        (random access into the base table by row address)."""
        sel = self._split_offsets.get(split)
        if sel is None:
            raise InvalidInputError(f"no split {split}")
        window = sel[offset : offset + num_rows]
        rids = self._row_ids[window]
        return self.base_table._dataset.take_rows(rids, columns=columns)


def permutation_builder(table, dest: str | None = None) -> PermutationBuilder:
    """Entry point (reference permutation.py:234 `permutation_builder`)."""
    return PermutationBuilder(table, dest)


class PermutationSplit:
    """One split of a permutation viewed as a virtual table (reference
    permutation.py `Permutation`: num_rows/num_columns/column_names/
    shape/schema plus windowed reads)."""

    def __init__(self, perm: Permutation, split: int, name: str):
        self._perm = perm
        self.split = split
        self.name = name

    @property
    def schema(self) -> pa.Schema:
        return self._perm.base_table.schema

    @property
    def num_rows(self) -> int:
        return self._perm.split_size(self.split)

    @property
    def num_columns(self) -> int:
        return len(self.schema)

    @property
    def column_names(self) -> list[str]:
        return list(self.schema.names)

    @property
    def shape(self) -> tuple[int, int]:
        return (self.num_rows, self.num_columns)

    def __len__(self) -> int:
        return self.num_rows

    def read(self, offset: int = 0, num_rows: int | None = None,
             columns: list[str] | None = None) -> pa.Table:
        if num_rows is None:
            num_rows = self.num_rows - offset
        return self._perm.read(self.split, offset, num_rows, columns=columns)

    def to_table(self, columns: list[str] | None = None) -> pa.Table:
        return self.read(0, self.num_rows, columns=columns)


class Permutations:
    """Splits of a permutation indexed by ordinal or by name (reference
    permutation.py:238 `Permutations`). Names come from the
    permutation table's ``split_names`` schema-metadata key; absent
    names fall back to ``split_0`` … ``split_{n-1}``."""

    def __init__(self, base_table, permutation_table):
        self.base_table = base_table
        self.permutation_table = permutation_table
        self._perm = Permutation(permutation_table, base_table)
        meta = permutation_table.schema.metadata or {}
        raw = meta.get(b"split_names")
        names = json.loads(raw.decode()) if raw else None
        n = self._perm.num_splits
        if names is None or len(names) != n:
            names = [f"split_{i}" for i in range(n)]
        self.split_names: list[str] = names
        self.split_dict: dict[str, int] = {nm: i for i, nm in enumerate(names)}

    @classmethod
    def from_tables(cls, base_table, permutation_table) -> "Permutations":
        return cls(base_table, permutation_table)

    def __len__(self) -> int:
        return self._perm.num_splits

    def __getitem__(self, key) -> PermutationSplit:
        if isinstance(key, str):
            if key not in self.split_dict:
                raise InvalidInputError(f"no split named {key!r}")
            idx = self.split_dict[key]
        else:
            idx = int(key)
            if not (0 <= idx < len(self)):
                raise InvalidInputError(f"split index {idx} out of range")
        return PermutationSplit(self._perm, idx, self.split_names[idx])

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]
